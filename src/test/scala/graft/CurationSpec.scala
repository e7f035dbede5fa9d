package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Curation operators: deterministic sampling and sequence packing. */
class CurationSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("hash sampling is deterministic and near the nominal rate") {
    val a = Curation.hashSample(docs, "text", 8).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Curation.hashSample(docs, "text", 8).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.05 && rate < 0.25, f"sample rate $rate%.3f far from 1/8")
  }

  test("sequence packing invariants: offsets bounded, layout is the running sum") {
    val bin = 100
    val packed = Curation.packSequences(docs, "lang", bin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.nonEmpty)
    packed.foreach { case (_, id, _, binId, off) =>
      assert(off >= 0 && off < bin, s"doc $id offset $off out of range")
      assert(binId >= 0)
    }
    // per stratum: bin_id/bin_offset equal the running token sum in doc_id order
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var start = 0L
      rows.sortBy(_._2).foreach { case (_, id, n, binId, off) =>
        assert(binId === start / bin, s"doc $id bin")
        assert(off === start % bin, s"doc $id offset")
        start += n
      }
    }
  }

  test("weightedSample favors high-quality docs, is deterministic, keys ordered") {
    import spark.implicits._
    // 100 high-quality docs (long, stopword-rich -> w ~ 0.79) and 100
    // low-quality (3 words, no stopwords -> w ~ 0.215); ES keys scale
    // with 1/w so the top-50 must be dominated by the high-quality half
    val hi = (0 until 100).map { i =>
      (i.toLong, (s"the a of and to in is doc$i " * 13).trim)
    }
    val lo = (100 until 200).map { i => (i.toLong, s"zz$i yy$i xx$i") }
    val docs = (hi ++ lo).toDF("doc_id", "text")
    val got = Curation.weightedSample(docs, 50).collect()
    assert(got.length === 50)
    val nHigh = got.count(_.getLong(0) < 100L)
    assert(nHigh > 30, s"expected high-quality majority, got $nHigh/50")
    assert(got.exists(_.getLong(0) >= 100L) || nHigh === 50,
      "draw is weighted, not a hard threshold") // informational guard
    val keys = got.map(_.getDouble(2))
    assert(keys.zip(keys.drop(1)).forall { case (a, b) => a <= b })
    // pure function of the rows: a repartitioned rerun returns the
    // identical sample in the identical order
    val again = Curation.weightedSample(docs.repartition(13), 50).collect()
    assert(got.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("DPO pairs: disjoint ends, margin floor, partition-stable") {
    val pairs = Curation.dpoPairs(docs).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("chosen_id") !== r.getAs[Long]("rejected_id"))
      assert(r.getAs[Double]("margin") >= Curation.DpoMinMargin)
      assert(r.getAs[Double]("chosen_score") > r.getAs[Double]("rejected_score"))
      assert(r.getAs[Int]("pair_idx") >= 1 &&
        r.getAs[Int]("pair_idx") <= Curation.DpoPairsPerGroup)
    }
    // a doc never plays both roles across the set (the n_cand >= 2k gate
    // keeps the top-k and bottom-k rank sets disjoint within each pool)
    val chosenIds = pairs.map(_.getAs[Long]("chosen_id")).toSet
    val rejectedIds = pairs.map(_.getAs[Long]("rejected_id")).toSet
    assert(chosenIds.intersect(rejectedIds).isEmpty)
    // pure function of the rows, not the partitioning
    val again = Curation.dpoPairs(docs.repartition(13))
      .orderBy("lang", "source", "bucket", "pair_idx").collect()
    val first = Curation.dpoPairs(docs)
      .orderBy("lang", "source", "bucket", "pair_idx").collect()
    assert(first.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("l-diversity: homogeneous groups flag even when k-anonymous") {
    import graft.operators.Curation
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group A: 4 rows, ONE sensitive value -> k-anonymous at k=3 yet
    // 1-diverse (at risk at l=3); group B: 3 rows, 3 distinct -> safe
    val df = Seq(
      ("A", 10L), ("A", 10L), ("A", 10L), ("A", 10L),
      ("B", 1L), ("B", 2L), ("B", 3L)).toDF("qi", "sens")
    val byQi = Curation.lDiversityAudit(df, Seq("qi"), col("sens"), 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(byQi("A") === ((4L, 1L, true)))
    assert(byQi("B") === ((3L, 3L, false)))
    val e2e = Curation.qLdiversity(spark, sf0001).collect()
    assert(e2e.nonEmpty)
  }

  test("doremi: hand-checked MW iteration, invariants, loss-monotone weights") {
    import graft.operators.Doremi
    // two domains, losses 0.1 / 0.3 (micros), one iteration by hand:
    // mix = 0.5*0.1 + 0.5*0.3 = 0.2; factors 1 + 0.5*(-0.1) = 0.95 and
    // 1 + 0.5*(+0.1) = 1.05; weights 0.475 / 0.525 exactly
    val one = Doremi.reweight(Seq(("a", 100000L), ("b", 300000L)), iterations = 1)
    assert(one === Seq(("a", 100000L, 475000L), ("b", 300000L, 525000L)))
    // five iterations: weights stay a distribution (within per-domain
    // half-up rounding of the sum) and order by loss
    val five = Doremi.reweight(Seq(("a", 100000L), ("b", 300000L), ("c", 200000L)))
    val total = five.map(_._3).sum
    assert(math.abs(total - 1000000L) <= five.size)
    assert(five.sortBy(_._2).map(_._3) === five.map(_._3).sorted,
      "higher proxy loss must receive higher weight")
    // end to end on the corpus: the gate pins exactness; this pins the
    // semantics (sum-to-one and loss-monotonicity over real sources)
    val out = graft.operators.Doremi.qDoremi(spark, sf0001).collect()
    assert(out.length >= 2)
    val w = out.map(r => (r.getLong(1), r.getLong(2)))
    assert(math.abs(w.map(_._2).sum - 1000000L) <= out.length)
    assert(w.sortBy(_._1).map(_._2) === w.map(_._2).sorted)
  }

  test("doremi: MW factor clamps at the positive floor for far-below-mixture losses") {
    import graft.operators.Doremi
    // domain 'lo' sits ~5.0 loss units below the mixture average —
    // far past the 1/η = 2.0 point where the linearized factor goes
    // negative. The FactorFloor clamp must keep every weight positive
    // and the distribution normalized through all iterations.
    val skewed = Doremi.reweight(Seq(("lo", 100L), ("hi", 10000000L)))
    assert(skewed.forall(_._3 >= 0L), s"clamped weights must never go negative: $skewed")
    assert(math.abs(skewed.map(_._3).sum - 1000000L) <= skewed.size)
    // the clamped low-loss domain collapses toward zero (may quantize to
    // 0 micros under extreme gaps — but never below)
    val lo = skewed.find(_._1 == "lo").get._3
    val hi = skewed.find(_._1 == "hi").get._3
    assert(lo < hi)
    assert(lo < 10000L, s"clamped weight should be tiny, got $lo")
    // a gap just past the 1/η threshold (2.2 loss units): clamp engages
    // on iteration 1 but the weight stays strictly positive
    val mild = Doremi.reweight(Seq(("lo", 100000L), ("hi", 2300000L)), iterations = 1)
    assert(mild.forall(_._3 > 0L), s"mild-gap weights must stay positive: $mild")
    assert(math.abs(mild.map(_._3).sum - 1000000L) <= mild.size)
  }

  test("alpha sampling: a distribution that flattens toward the tail") {
    import graft.operators.Curation
    import spark.implicits._
    val docs = Seq.tabulate(130)(i =>
      (i.toLong, "text", if (i < 100) "big" else if (i < 128) "mid" else "tiny"))
      .toDF("doc_id", "text", "source")
    val out = Curation.alphaSample(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // √100=10, √28≈5.291503, √2≈1.414214; Σ≈16.705717
    assert(out("big")._1 === 100L && out("mid")._1 === 28L && out("tiny")._1 === 2L)
    val ws = Seq("big", "mid", "tiny").map(out(_)._2)
    assert(math.abs(ws.sum - 1.0) < 1e-5, s"weights must sum to 1: $ws")
    assert(ws(0) > ws(1) && ws(1) > ws(2), "α<1 preserves the size ordering")
    // flattening: the weight ratio is compressed vs the raw share ratio
    assert(ws(0) / ws(2) < 100.0 / 2.0,
      "α=1/2 must compress the head/tail ratio")
    // boost: below-average-share domains are up-weighted, head is down
    assert(out("tiny")._3 > 1.0 && out("big")._3 < 1.0)
    // hand value: w(big) = 10 / 16.705717 = 0.598597
    assert(math.abs(out("big")._2 - 0.598597) < 2e-6)
    // end to end on the corpus
    val e2e = Curation.qAlphaSample(spark, sf0001).collect()
    assert(e2e.nonEmpty)
    assert(math.abs(e2e.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }

  test("doremi_kn: KN log-perplexity proxy loss drives the reweighting") {
    import graft.operators.{Doremi, TextSearch}
    // the per-source loss is the mean per-doc KN log-perplexity — cross-
    // check one source against an independent computation from knScore's
    // own output (ppl -> ln(ppl) ~ loss/1e6 within quantization noise)
    val docs = graft.engine.Tables.documents(spark, sf0001)
    val losses = Doremi.domainLossKn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(losses.nonEmpty)
    assert(losses.values.forall(_ > 0L), "log-perplexity losses are positive")
    val db = TextSearch.bigramPairs(docs).groupBy("w1", "w2").count().count()
    val ppl = TextSearch.knScore(docs, db)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Double]("kn_ppl")))
    val bySrc = ppl.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(x => math.log(x._2)).sum / xs.length
    }
    bySrc.foreach { case (s, meanLn) =>
      val got = losses(s) / 1e6
      assert(math.abs(got - meanLn) < 0.01,
        s"source $s: loss ${got} vs independent mean-ln-ppl $meanLn")
    }
    // end to end: a distribution, monotone in the loss
    val out = Doremi.qDoremiKn(spark, sf0001).collect()
    val w = out.map(r => (r.getLong(1), r.getLong(2)))
    assert(math.abs(w.map(_._2).sum - 1000000L) <= out.length)
    assert(w.sortBy(_._1).map(_._2) === w.map(_._2).sorted,
      "higher KN log-perplexity must receive higher weight")
  }

  test("dq checks: failing constraints report false; one row per constraint") {
    import spark.implicits._
    import graft.operators.Curation.DqConstraint
    // duplicate key + one null text: uniqueness and completeness must FAIL
    val df = Seq((1L, "a"), (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Curation.dqChecks(df, Seq(
      DqConstraint("doc_id_unique",
        Curation.dqRatio(countDistinct(col("doc_id")), count(lit(1))), _ == 1.0),
      DqConstraint("text_complete", Curation.dqShare(col("text").isNotNull), _ == 1.0),
      DqConstraint("doc_id_non_negative", min(col("doc_id")).cast("double"), _ >= 0.0)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out("doc_id_unique") === ((0.5, false)))
    assert(out("text_complete") === ((0.5, false)))
    assert(out("doc_id_non_negative") === ((1.0, true)))
    // the production contract passes on the real table
    val contract = Curation.dqChecks(
      graft.engine.Tables.documents(spark, sf0001), Curation.documentContract)
    assert(contract.collect().forall(_.getBoolean(2)), "documents contract must pass")
    // EMPTY table: every observation aggregates to NULL — the gate must
    // report failures (observed NaN), never crash (review: the first cut
    // NPE'd on exactly the degenerate snapshot it exists to block)
    val empty = Curation.dqChecks(df.filter(lit(false)), Seq(
      DqConstraint("doc_id_unique",
        Curation.dqRatio(countDistinct(col("doc_id")), count(lit(1))), _ == 1.0),
      DqConstraint("doc_id_non_negative", min(col("doc_id")).cast("double"), _ >= 0.0)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(!empty("doc_id_non_negative")._2, "NULL observation must FAIL")
    assert(empty("doc_id_non_negative")._1.isNaN)
    // ratio observations guard the zero denominator (ANSI /0 throws):
    // NULL -> NaN, failed
    assert(!empty("doc_id_unique")._2)
    assert(empty("doc_id_unique")._1.isNaN)
  }
}

