package graft

import graft.operators.{Bitext, Multimodal}

/** Specs for the round-7 batch-5 operators: energy VAD, PNG tEXt
  * metadata, and Gale-Church bitext alignment. The oracle gates cover
  * the distributed paths; these pin the pure functions and failure
  * modes. */
class MediaPipelineSpec extends SparkSpec {

  // ------------------------------------------------------------- VAD

  private def frames(pattern: Boolean*): Array[Int] =
    pattern.zipWithIndex.flatMap { case (active, f) =>
      Array.tabulate(Multimodal.VadFrameLen)(i =>
        if (active) ((f * 100 + i) % 7) + 1 else 0)
    }.toArray

  test("vadSegments merges maximal active runs and skips silence") {
    // A A S A -> two segments: (0, start 0, len 2), (1, start 3, len 1)
    assert(Multimodal.vadSegments(frames(true, true, false, true))
      === Seq((0, 0, 2L), (1, 3, 1L)))
    // all silent -> no segments; all active -> one full-span segment
    assert(Multimodal.vadSegments(frames(false, false, false)).isEmpty)
    assert(Multimodal.vadSegments(frames(true, true, true)) === Seq((0, 0, 3L)))
    assert(Multimodal.vadSegments(Array.empty[Int]).isEmpty)
  }

  test("VAD fixture round trip: decoded segments match the silence plant") {
    for (id <- Seq(0L, 3L, 7L, 42L, 199L)) {
      val Some((rate, ch, samples)) =
        Multimodal.decodeWavSamples(Multimodal.buildWavVad(id))
      assert(rate === 8000 && ch === 1)
      val nf = Multimodal.vadFrames(id)
      assert(samples.length === nf * Multimodal.VadFrameLen)
      // active frames have provably nonzero energy (37 coprime to 65536:
      // at most one zero sample per 100-sample frame)
      for (f <- 0 until nf) {
        val e = (0 until Multimodal.VadFrameLen)
          .map(i => math.abs(samples(f * Multimodal.VadFrameLen + i)).toLong).sum
        assert((e == 0L) === Multimodal.vadSilent(id, f), s"clip $id frame $f")
      }
      // segments equal a direct gaps-and-islands replay of the plant
      val expect = (0 until nf).filterNot(Multimodal.vadSilent(id, _))
        .foldLeft(Vector.empty[(Int, Int)]) { (acc, f) =>
          if (acc.nonEmpty && acc.last._1 + acc.last._2 == f)
            acc.init :+ ((acc.last._1, acc.last._2 + 1))
          else acc :+ ((f, 1))
        }.zipWithIndex.map { case ((st, len), idx) => (idx, st, len.toLong) }
      assert(Multimodal.vadSegments(samples) === expect, s"clip $id")
    }
  }

  test("clip fixture round trip: at-rail counts match the sample formula") {
    for (id <- Seq(0L, 1L, 3L, 7L, 199L)) {
      val Some((rate, ch, samples)) =
        Multimodal.decodeWavSamples(Multimodal.buildWavClip(id))
      assert(rate === 8000 && ch === 1)
      assert(samples.length === Multimodal.clipSamples(id))
      samples.zipWithIndex.foreach { case (s, i) =>
        assert(s === Multimodal.clipSample(id, i), s"clip $id sample $i")
      }
      val nc = samples.count(s => s == 32767 || s == -32768)
      val planted = id % 3 == 0
      // the 20% plant always clears the 5% bar; unplanted clips carry
      // only incidental formula rail-hits (37 coprime to 65536: at most
      // a handful per 300 samples), which never reach it
      assert((nc * 20 > samples.length) === planted, s"clip $id verdict (nc=$nc)")
    }
  }

  // -------------------------------------------------------- PNG tEXt

  test("tEXt splice round-trips through the independent chunk walk") {
    val kvs = Seq(("Author", "author 5"), ("Comment", "with spaces and: colons"))
    val png = Multimodal.addTextChunks(Multimodal.buildPng(5L), kvs)
    val Some((w, h, got)) = Multimodal.pngTextChunks(png)
    assert((w, h) === Multimodal.imageDims(5L))
    assert(got === kvs)
    // the spliced file is still a VALID PNG: ImageIO decodes identical pixels
    val Some((dw, dh, sum)) = Multimodal.decodePng(png)
    val Some((ow, oh, osum)) = Multimodal.decodePng(Multimodal.buildPng(5L))
    assert((dw, dh, sum) === ((ow, oh, osum)))
  }

  test("chunk walk survives a hostile 2^31-ish chunk length (review fix)") {
    // a declared length of 0x7FFFFFF0 used to wrap the Int bound check
    // and throw from the String constructor instead of returning None
    val png = Multimodal.buildPng(3L)
    val evil = java.util.Arrays.copyOf(png, png.length)
    // overwrite the chunk header right after IHDR (offset 33) with a
    // huge length + a tEXt type
    val bb = java.nio.ByteBuffer.wrap(evil)
    bb.putInt(33, 0x7FFFFFF0)
    evil(37) = 't'; evil(38) = 'E'; evil(39) = 'X'; evil(40) = 't'
    val got = Multimodal.pngTextChunks(evil)
    assert(got.isDefined && got.get._3.isEmpty, "walk must stop cleanly, not throw")
  }

  test("chunk walk rejects junk and reads metadata-free images as empty") {
    assert(Multimodal.pngTextChunks("not a png".getBytes).isEmpty)
    assert(Multimodal.pngTextChunks(Array.emptyByteArray).isEmpty)
    val Some((_, _, kvs)) = Multimodal.pngTextChunks(Multimodal.buildPng(3L))
    assert(kvs.isEmpty)
    // truncated mid-chunk: geometry survives, walk stops cleanly
    val full = Multimodal.addTextChunks(Multimodal.buildPng(3L), Seq(("K", "v")))
    val Some((w, _, partial)) = Multimodal.pngTextChunks(full.take(40))
    assert(w === Multimodal.imageDims(3L)._1 && partial.isEmpty)
  }

  // ---------------------------------------------------------- bitext

  test("align recovers 1-1, 2-1 and 1-2 beads on exact-ratio instances") {
    // pure 1-1: targets at exactly 3/2 scale
    assert(Bitext.align(Array(20, 30), Array(30, 45))
      === Seq((0, 1, 0, 1), (1, 1, 1, 1)))
    // one merge: sources 20+24 -> one target of 66
    assert(Bitext.align(Array(20, 24, 30), Array(66, 45))
      === Seq((0, 2, 0, 1), (2, 1, 1, 1)))
    // one split: source 40 -> targets 30 + 30
    assert(Bitext.align(Array(40, 20), Array(30, 30, 30))
      === Seq((0, 1, 0, 2), (1, 1, 2, 1)))
  }

  test("align ties prefer 1-1 (the bead-penalty prior)") {
    // degenerate zero lengths: every move costs 0 + penalty; the 1-1
    // chain must win over any merge/split path
    assert(Bitext.align(Array(0, 0), Array(0, 0))
      === Seq((0, 1, 0, 1), (1, 1, 1, 1)))
  }

  test("align recovers the planted pattern for sample documents") {
    for (id <- Seq(0L, 1L, 2L, 3L, 42L, 199L)) {
      val n = Bitext.nSrcSentences(id)
      val src = Array.tabulate(n)(Bitext.srcLen(id, _))
      val tgt = Bitext.tgtLens(id).toArray
      val got = Bitext.align(src, tgt)
      // replay the plant directly
      val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
      var k = 0
      var t = 0
      while (k < n) {
        if (Bitext.isMergeStart(id, k, n)) { expect += ((k, 2, t, 1)); k += 2; t += 1 }
        else if (Bitext.isSplit(id, k)) { expect += ((k, 1, t, 2)); k += 1; t += 2 }
        else { expect += ((k, 1, t, 1)); k += 1; t += 1 }
      }
      assert(got === expect.toSeq, s"doc $id")
    }
  }

  test("sentence builder emits exact lengths with a terminal period") {
    for (len <- Seq(1, 2, 20, 49)) {
      val s = Bitext.sentence(len)
      assert(s.length === len && s.endsWith("."))
    }
  }
}
