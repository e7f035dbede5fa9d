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
object GateProbe3 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, "gate-probe3")
    spark.read.parquet(s"$d/region.parquet").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gp3] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm once
    graft.streaming.StreamingJobs.qDedupGate(spark, d).count()
    // now replicate the gate with phase timing
    val gateDir = graft.operators.Dedup.processTempDir("graft_gp3")
    graft.operators.Dedup.rmTree(new java.io.File(gateDir))
    val docs = graft.engine.Tables.documents(spark, d).select("doc_id", "text")
    val all = docs
      .unionByName(docs.filter(col("doc_id") % 20 === 0).withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(docs.filter(col("doc_id") % 30 === 0).withColumn("doc_id", col("doc_id") + 1000001L))
    val (acc, idx, rej) = (s"$gateDir/accepted", s"$gateDir/index", s"$gateDir/rejected")
    Seq(0L, 1L).foreach { b =>
      t(s"batch $b TOTAL") {
        graft.streaming.StreamingJobs.dedupGateBatch(spark,
          all.filter(col("doc_id") % 2 === b), b, acc, idx, rej, 0.5, exactPairs = true)
      }
    }
    t("final read+union+orderBy") {
      spark.read.parquet(acc)
        .select(col("doc_id"), lit("accepted").as("status"),
          lit(null).cast("long").as("witness"), (col("doc_id") % 2).as("batch_id"))
        .unionByName(spark.read.parquet(rej).select(col("doc_id"),
          col("reason").as("status"), col("witness"), col("batch_id")))
        .orderBy("doc_id", "status").count()
    }
    spark.stop()
  }
}
object GateProbe6 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, "gate-probe6")
    spark.read.parquet(s"$d/region.parquet").count()
    graft.streaming.StreamingJobs.qDedupGate(spark, d).count() // warm
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    val starts = scala.collection.mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(), Option(js.properties.getProperty("spark.job.description")).getOrElse("?").take(80))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.get(je.jobId).foreach { case (t0, desc) =>
          jobs += ((je.jobId, System.nanoTime() - t0, desc)) }
    })
    val t0 = System.nanoTime()
    graft.streaming.StreamingJobs.qDedupGate(spark, d).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[gp6] wall: $wall%.2f s, jobs: ${jobs.length}, job-time sum: ${jobs.map(_._2).sum / 1e9}%.2f s")
    jobs.sortBy(-_._2).take(20).foreach { case (id, ns, desc) =>
      println(f"[gp6] job $id%3d ${ns / 1e9}%6.2f s  $desc") }
    spark.stop()
  }
}
object GateProbe7 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, "gate-probe7")
    spark.read.parquet(s"$d/region.parquet").count()
    graft.streaming.StreamingJobs.qDedupGate(spark, d).count() // warm
    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      graft.streaming.StreamingJobs.qDedupGate(spark, d).count()
      println(f"[gp7] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run("aqe on 1"); run("aqe on 2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe off 1"); run("aqe off 2")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    run("aqe on sp8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe off sp8 1"); run("aqe off sp8 2")
    spark.stop()
  }
}
object GateProbe9 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, "gate-probe9")
    spark.read.parquet(s"$d/region.parquet").count()
    graft.streaming.StreamingJobs.qDedupGate(spark, d).count() // warm
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Long, String, Int)]()
    val starts = scala.collection.mutable.Map[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(js.properties.getProperty("spark.job.description"))
          .getOrElse(js.stageInfos.lastOption.map(_.name).getOrElse("?"))
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts(js.jobId) = (System.nanoTime(), site.take(90), nTasks)
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.get(je.jobId).foreach { case (t0, site, nt) =>
          jobs += ((je.jobId, System.nanoTime() - t0, site, nt)) }
    })
    val t0 = System.nanoTime()
    graft.streaming.StreamingJobs.qDedupGate(spark, d).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[gp9] wall: $wall%.2f s, jobs: ${jobs.length}, job-time sum: ${jobs.map(_._2).sum / 1e9}%.2f s")
    jobs.sortBy(_._1).foreach { case (id, ns, site, nt) =>
      println(f"[gp9] job $id%3d ${ns / 1e9}%6.2f s ${nt}%4d t  $site") }
    spark.stop()
  }
}
