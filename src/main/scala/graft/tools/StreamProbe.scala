package graft.tools

/** Micro-batch duration breakdown for the streaming replay quartet:
  * attach a StreamingQueryListener and print each batch's durationMs map
  * (triggerExecution, queryPlanning, addBatch, walCommit, commitOffsets,
  * getBatch, latestOffset) — guide §1: find where micro-batch wall time
  * actually goes before touching the replay machinery. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = if (args.nonEmpty) args(0) else "q_stream_join"
    val spark = graft.engine.GraftSession.local(32, "stream-probe")
    spark.read.parquet(s"$d/region.parquet").count()
    import scala.jdk.CollectionConverters._
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        rows += ((p.batchId, p.durationMs.asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")))
      }
    })
    val fn = graft.SparkEntry.queries(which)
    fn(spark, d).count() // warm
    rows.clear()
    val t0 = System.nanoTime()
    fn(spark, d).count()
    println(f"[sp] $which wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    rows.foreach { case (b, s) => println(s"[sp] batch $b: $s") }
    spark.stop()
  }
}
