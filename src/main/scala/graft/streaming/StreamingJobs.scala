package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming jobs (engine extension; the reference has no
  * event-time processing — SURVEY §2.9 "absent" row). The batch
  * formulations in operators.EventAnalytics are the oracle-checked
  * equivalents; these streaming variants are asserted equal to them in
  * StreamingSpec. */
object StreamingJobs {

  /** events.parquet physical schema under nanosAsLong (ts is INT64 nanos). */
  val eventsFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling 1-hour event counts as a streaming query (watermarked
    * event-time window) over a DIRECTORY of event parquet files (the
    * FileStreamSource contract; new files appearing in the directory are
    * picked up as micro-batches). Same result as
    * EventAnalytics.qEventWindow's count column when run to completion. */
  def eventWindowCounts(spark: SparkSession, eventsDir: String): DataFrame =
    spark.readStream
      .schema(eventsFileSchema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
}
