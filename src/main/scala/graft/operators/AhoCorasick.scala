package graft.operators

import scala.collection.mutable

/** Classic Aho-Corasick multi-pattern string automaton (Aho & Corasick
  * 1975): a trie over the dictionary with BFS failure links and merged
  * output sets, giving one O(|text|) scan that reports EVERY occurrence of
  * every pattern — including patterns nested inside other patterns'
  * matches, which surface exclusively through the fail links.
  *
  * Built once at the driver from the (tiny) dictionary and shipped in the
  * task closure — the standard broadcast-dim posture. Node transitions are
  * per-node hash maps (the dictionary alphabet is sparse); the scan takes
  * the fail path at most once per consumed character amortized, so a
  * 10k-phrase production blocklist costs the same single pass as six
  * phrases.
  *
  * Deliberately NOT a Catalyst expression: the automaton is shared mutable
  * read-only state across all rows of a partition, which is exactly the
  * mapPartitions contract; codegen would rebuild per-expression state.
  */
final class AhoCorasick private (
    next: Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val nPatterns: Int)
    extends Serializable {

  /** Count every occurrence of every pattern in `text`; slot i of the
    * result is pattern i's total (overlapping occurrences included). */
  def countMatches(text: String): Array[Int] = {
    val counts = new Array[Int](nPatterns)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      // follow fail links until a goto exists (root loops to itself)
      var s = state
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      state = next(s).getOrElse(c, 0)
      val hits = out(state)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  /** Build the automaton: trie insertion, then BFS failure links with
    * output-set merging (out(u) ++= out(fail(u)) — the step that makes
    * nested patterns visible at every match end). */
  def build(patterns: Array[String]): AhoCorasick = {
    val next = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outSets = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        node = next(node).getOrElseUpdate(c, {
          next += mutable.Map.empty[Char, Int]
          outSets += mutable.ArrayBuffer.empty[Int]
          next.length - 1
        })
      }
      outSets(node) += pi
    }
    val fail = new Array[Int](next.length)
    val queue = mutable.Queue.empty[Int]
    next(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        outSets(v) ++= outSets(fail(v))
        queue += v
      }
    }
    new AhoCorasick(
      next.map(_.toMap).toArray, fail, outSets.map(_.toArray).toArray,
      patterns.length)
  }
}
