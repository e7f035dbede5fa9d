package graft.tools
import org.apache.spark.sql.functions._
/** Scratch phase-timing probe for the dedup gate (round-6 tuning). */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.engine.GraftSession.local(32, "gate-probe")
    s.read.parquet(s"$d/region.parquet").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gateprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // one full q_dedup_gate (2 batches), then a second invocation to see
    // warm-vs-cold, then individual stage costs on batch-0 inputs
    t("full q_dedup_gate (cold)")(graft.streaming.StreamingJobs.qDedupGate(s, d).count())
    t("full q_dedup_gate (warm)")(graft.streaming.StreamingJobs.qDedupGate(s, d).count())
    val docs = graft.engine.Tables.documents(s, d).select("doc_id", "text")
    val all = docs
      .unionByName(docs.filter(col("doc_id") % 20 === 0).withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(docs.filter(col("doc_id") % 30 === 0).withColumn("doc_id", col("doc_id") + 1000001L))
    val b0 = all.filter(col("doc_id") % 2 === 0).withColumn("xxh", xxhash64(col("text"))).localCheckpoint()
    t("signedIndexOf b0")(graft.operators.Dedup.signedIndexOf(b0).count())
    val sigs = graft.operators.Dedup.signedIndexOf(b0).localCheckpoint()
    t("fused pairs (no index)")(graft.operators.Dedup.gateFusedExactPairs(s, None, sigs, 0.5).count())
    val pairs = graft.operators.Dedup.gateFusedExactPairs(s, None, sigs, 0.5)
      .filter(!col("is_corpus")).select("doc_a", "doc_b").localCheckpoint()
    t("nearDupClusters")(graft.operators.Dedup.nearDupClusters(pairs).count())
    s.stop()
  }
}
object GateProbe8 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.engine.GraftSession.local(32, "gate-probe8")
    s.read.parquet(s"$d/region.parquet").count()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gateprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("full gate sp=8 (cold)")(graft.streaming.StreamingJobs.qDedupGate(s, d).count())
    t("full gate sp=8 (warm)")(graft.streaming.StreamingJobs.qDedupGate(s, d).count())
    t("full gate sp=8 (warm2)")(graft.streaming.StreamingJobs.qDedupGate(s, d).count())
    s.stop()
  }
}
