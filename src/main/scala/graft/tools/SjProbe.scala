package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
/** Scratch probe: where do stream-stream join seconds go? */
object SjProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = graft.engine.GraftSession.local(32, "sj-probe")
    s.read.parquet(s"$d/region.parquet").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sj] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ev = graft.engine.Tables.events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("click_ts"))
    val root = graft.operators.Dedup.processTempDir("graft_sj_probe")
    graft.operators.Dedup.rmTree(new java.io.File(root))
    val (srcV, srcC) = (s"$root/v", s"$root/c")
    views.coalesce(1).write.parquet(srcV)
    clicks.coalesce(1).write.parquet(srcC)
    val vSchema = StructType(Seq(StructField("view_id", LongType),
      StructField("v_user", LongType), StructField("view_ts", TimestampType)))
    val cSchema = StructType(Seq(StructField("click_id", LongType),
      StructField("c_user", LongType), StructField("click_ts", TimestampType)))
    def run(label: String, parts: Int, mft: Option[Int]): Unit = t(label) {
      val out = s"$root/out_$label"; val ck = s"$root/ck_$label"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        def rd(schema: StructType, p: String, wm: String) = {
          val r = s.readStream.schema(schema)
          mft.foreach(n => r.option("maxFilesPerTrigger", n))
          r.parquet(p)
        }
        val v = rd(vSchema, srcV, "").withWatermark("view_ts", "1 hour")
        val c = rd(cSchema, srcC, "").withWatermark("click_ts", "1 hour")
        val q = v.join(c, col("v_user") === col("c_user") &&
            col("click_ts") >= col("view_ts") &&
            col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
          .select(col("view_id"), col("click_id"))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck).outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        q.recentProgress.foreach { p =>
          println(s"[sj]   batch ${p.batchId}: ${p.durationMs} rows=${p.numInputRows}")
        }
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      println(s"[sj] $label rows=" + s.read.parquet(s"$root/out_$label").count())
    }
    run("p1_single_batch", 1, None)
    run("p1_again", 1, None)
    run("p2_again", 2, None)
    s.stop()
  }
}
