package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Robustness: NULL text/value rows are routine in a 100 TB corpus
  * (failed extractions, schema evolution). Operators must either skip
  * null rows or handle them explicitly — never emit nonsense (size(NULL)
  * is -1 in Spark, which silently poisons token counts downstream). */
class NullInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today", "en", "src1", 60L),
    (2L, null.asInstanceOf[String], "en", "src2", 0L),
    (3L, "a second real document with enough words to shingle cleanly here", "en", "src3", 60L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dedup family: null-text docs neither crash nor pair") {
    assert(Dedup.ngramNearDups(docs, 0.1).count() === 0)
    assert(Dedup.minhashNearDups(docs, 0.1).count() === 0)
    assert(Dedup.exact(docs, "text", "doc_id").count() >= 2)
    // the null-text doc's row is pinned: explicit zeros and empty text,
    // never size(NULL) = -1 nonsense
    val span = Dedup.spanDedup(docs)
    assert(span.count() === 3)
    val nullRow = span.filter(col("doc_id") === 2L).head()
    assert(nullRow.getAs[Long]("n_tokens") === 0L)
    assert(nullRow.getAs[Long]("n_kept") === 0L)
    assert(nullRow.getAs[String]("text_clean") === "")
  }

  test("token operators: null-text docs do not poison counts") {
    val lm = TextSearch.bigramLm(docs, 10L)
    assert(lm.filter(col("n") <= 0).count() === 0)
    val cov = TextSearch.vocabCoverage(docs, Seq(0.9)).head()
    assert(cov.getLong(0) > 0)
    val imp = TextAnalysis.importanceWeights(docs, col("source") === "src1")
    assert(imp.filter(col("n_tokens") <= 0).count() === 0)
    val enc = TextSearch.bpeEncode(docs, Seq(("t", "h")))
    assert(enc.filter(col("n_bpe_tokens") < 0).count() === 0)
  }

  test("classifier/planner: null-text docs neither crash nor emit nonsense") {
    // a null-text doc carries NO token evidence: nbClassify skips it (no
    // prediction beats a prior-only guess pretending to be evidence)
    val nb = TextAnalysis.nbClassify(docs, "lang")
    assert(nb.count() === 2)
    assert(nb.filter(col("doc_id") === 2L).count() === 0)
    // mixPlan counts a null-text doc as zero tokens: the all-null source
    // gets an explicit 0-token row with a 0 allocation, never a NULL cap
    val plan = Curation.mixPlan(docs, 100.0, 2.0, 2.0)
    assert(plan.filter(col("n_tokens") < 0).count() === 0)
    val nullSrc = plan.filter(col("source") === "src2").head()
    assert(nullSrc.getAs[Long]("n_tokens") === 0L)
    assert(nullSrc.getAs[Double]("unimax_alloc") === 0.0)
  }

  test("curation: null-text docs do not produce negative token math") {
    val packed = Curation.packSequences(docs, "lang")
    assert(packed.filter(col("n_tokens") < 0).count() === 0,
      packed.collect().mkString(","))
    val sel = Curation.budgetSelect(docs, 1000L)
    assert(sel.filter(col("n_tokens") < 0).count() === 0)
  }

  test("events: null values do not crash anomaly/funnel") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", Some(1.0)),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "click", None),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "purchase", Some(2.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventAnalytics.funnel(ev, Seq("view", "click", "purchase"))
      .head().getAs[Long]("depth") === 3L)
    assert(EventAnalytics.anomalies(ev, 3.0).count() === 0)
    // transitions: a null-typed DESTINATION is indistinguishable from
    // stream end (lead() yields NULL for both) and is dropped, exactly
    // like the oracle's WHERE next_type IS NOT NULL; a null-typed SOURCE
    // survives as an explicit (null -> to) row
    val evN = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", Some(1.0)),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 1L,
        null.asInstanceOf[String], Some(1.0)),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "click", Some(1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val tr = EventAnalytics.transitions(evN)
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(tr === Set((null, "click")))
  }

  test("anomalies: null values count as absent, not as zero") {
    // user 1: nine 10.0s, one null -- the null must not deflate the mean
    // (count(value), not count(*)) or fabricate variance
    val ev = ((1 to 9).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:0$i:00"), 1L, "view", Some(10.0))) :+
      ((10L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "view",
        None: Option[Double])))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // zero variance among the non-null values -> nothing flagged
    assert(EventAnalytics.anomalies(ev, 3.0).count() === 0)
  }
}
