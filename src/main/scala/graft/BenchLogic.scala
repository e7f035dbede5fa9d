package graft

/** Pure logic behind [[Bench]]'s end-of-suite outlier re-run, factored out
  * so it is unit-testable without a SparkSession (VERDICT r9 Next #2/#8):
  * the r9 driver artifact showed the re-run blinded by its own
  * intra-round persistence (a noise-elevated median became the baseline
  * and three 2-3x outliers sailed through with `"reruns":{}`), and the
  * old hand-scan `rest.indexOf('}')` parse would silently yield an empty
  * baseline on any format drift (ADVICE r9).
  *
  * Fixes, both pinned by BenchLogicSpec:
  *  - the BASELINE is the per-query MIN across the last-persisted result
  *    AND a bounded history of prior runs (a plan's true cost is its
  *    floor; noise only ever adds), so one noisy persisted run can no
  *    longer hide a later regression;
  *  - the parse walks the balanced `"queries"` object (string- and
  *    depth-aware), so reordered keys or a nested value can never
  *    silently truncate the map, and [[Bench]] logs loudly when files
  *    exist but parse empty. */
object BenchLogic {

  /** Extract the top-level numeric pairs of the `"queries"` object from a
    * persisted bench JSON line. Balanced-brace scan (depth- and
    * string-aware), not a first-'}' hand scan: nested values are skipped
    * rather than truncating the parse, and a missing/malformed object
    * returns empty instead of garbage. */
  def parseQueries(txt: String): Map[String, Double] = {
    val tag = "\"queries\":"
    val at = txt.indexOf(tag)
    if (at < 0) return Map.empty
    var i = at + tag.length
    while (i < txt.length && txt(i).isWhitespace) i += 1
    if (i >= txt.length || txt(i) != '{') return Map.empty
    val out = scala.collection.mutable.Map.empty[String, Double]
    var depth = 0
    var inStr = false
    var esc = false
    val sb = new StringBuilder // current top-level "key":value slice
    def flush(): Unit = {
      // whitespace-tolerant: '"key" : 1.0' (a pretty-printer's spaces
      // around ':' and after ',') parses the same as '"key":1.0' — the
      // class exists to SURVIVE format drift, not merely detect it.
      // Query names never contain escaped quotes, so the bare close-quote
      // scan is exact here.
      val s = sb.toString.trim
      if (s.startsWith("\"")) {
        val kEnd = s.indexOf('"', 1)
        val colonAt = if (kEnd > 0) s.indexOf(':', kEnd + 1) else -1
        if (colonAt > 0) {
          val key = s.substring(1, kEnd)
          val v = s.substring(colonAt + 1).trim
          try out(key) = v.toDouble catch { case _: NumberFormatException => }
        }
      }
      sb.clear()
    }
    while (i < txt.length) {
      val ch = txt(i)
      if (inStr) {
        if (depth == 1) sb.append(ch)
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == '"') inStr = false
      } else ch match {
        case '{' =>
          depth += 1
          if (depth > 1 && depth == 2) sb.clear() // nested value: drop slice
        case '}' =>
          depth -= 1
          if (depth == 0) { flush(); return out.toMap }
        case ',' if depth == 1 => flush()
        case '"' => inStr = true; if (depth == 1) sb.append(ch)
        case c if depth == 1 => sb.append(c)
        case _ =>
      }
      i += 1
    }
    Map.empty // unbalanced: refuse rather than return a truncated map
  }

  /** Per-query MIN across every parsable prior run: the re-run baseline.
    * Non-positive medians (error sentinels) never form a baseline. */
  def baseline(prevTexts: Seq[String]): Map[String, Double] =
    prevTexts.map(parseQueries)
      .foldLeft(Map.empty[String, Double]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (k, v)) =>
          if (v <= 0) a
          else a.updatedWith(k)(old => Some(old.fold(v)(math.min(_, v))))
        }
      }

  /** Queries whose fresh median landed > `factor` x their baseline floor. */
  def outliers(current: Map[String, Double], base: Map[String, Double],
      factor: Double = 2.0): Seq[String] =
    current.collect {
      case (name, v) if v > 0 && base.get(name).exists(p => v > factor * p) =>
        name
    }.toSeq.sorted

  /** ESCALATION (VERDICT r10 Next #1): an in-session re-run inherits the
    * session's pathology, so when the re-run AGREES with an elevated
    * reading (rerun still > `factor` x the min-across-history floor) the
    * deviation is UNRESOLVED — distinct from a clean rerun — and the next
    * session's bench measures those queries FIRST, before suite churn can
    * re-contaminate them (round 10's q_bm25: 3.99s median, 3.99s rerun,
    * 0.77s floor — the mechanism could only confirm, never correct). */
  def unresolved(reruns: Map[String, Double], base: Map[String, Double],
      factor: Double = 2.0, minDelta: Double = 0.5): Seq[String] =
    // the relative rule alone spams escalation on sub-second queries
    // (a 0.08s floor flags a 0.17s scheduling wobble — measured on this
    // suite); cross-session attention needs a meaningful ABSOLUTE delta
    // too. The q_bm25 class (0.77 -> 3.99, delta 3.2s) still escalates.
    reruns.collect {
      case (name, v) if v > 0 && base.get(name).exists(p =>
        v > factor * p && v - p > minDelta) => name
    }.toSeq.sorted

  /** Extract the `"unresolved"` string array persisted by the previous
    * run's artifact. Same drift posture as [[parseQueries]]: a missing or
    * malformed array reads as empty, never as garbage. */
  def parseUnresolved(txt: String): Seq[String] = {
    val tag = "\"unresolved\":"
    val at = txt.indexOf(tag)
    if (at < 0) return Seq.empty
    var i = at + tag.length
    while (i < txt.length && txt(i).isWhitespace) i += 1
    if (i >= txt.length || txt(i) != '[') return Seq.empty
    i += 1
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var inStr = false
    var esc = false
    val sb = new StringBuilder
    while (i < txt.length) {
      val ch = txt(i)
      if (inStr) {
        if (esc) { sb.append(ch); esc = false }
        else if (ch == '\\') esc = true
        else if (ch == '"') { out += sb.toString; sb.clear(); inStr = false }
        else sb.append(ch)
      } else ch match {
        case '"' => inStr = true
        case ']' => return out.toSeq
        case _ => // commas / whitespace between strings
      }
      i += 1
    }
    Seq.empty // unbalanced: refuse rather than return a truncated list
  }

  /** Suite order for the next session: prior-run unresolved queries first
    * (measured before churn accumulates), the rest in name order after. */
  def measureOrder(all: Seq[String], priority: Seq[String]): Seq[String] = {
    val p = priority.filter(all.toSet).distinct
    p ++ all.filterNot(p.toSet).sorted
  }

  /** Per-cohort subtotals over the final per-query map (errored queries'
    * -1 sentinels excluded; unattributed queries land in "other"). */
  def cohortTotals(results: Map[String, Double],
      cohortOf: Map[String, String]): Map[String, Double] =
    results.toSeq.filter(_._2 >= 0)
      .groupBy { case (k, _) => cohortOf.getOrElse(k, "other") }
      .map { case (c, xs) => c -> xs.map(_._2).sum }
}
