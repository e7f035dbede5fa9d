package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
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

  // ------------------------------------------------- streaming dedup gate

  /** documents.parquet physical schema (the streaming file source needs it
    * declared up front). */
  val docsFileSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming dedup gate: documents arrive as parquet files under
    * `docsDir`; each micro-batch is filtered in four deterministic steps
    * and the survivors become corpus state for every later batch:
    *
    *   1. exact within-batch — one survivor (min doc_id) per text hash;
    *   2. exact vs corpus   — anti-join on the accepted-fingerprint set;
    *   3. near-dup vs corpus — MinHash band-bucket probe of the persisted
    *      dedup index ([[Dedup.probeIndex]]), Jaccard >= threshold rejects;
    *   4. near-dup within batch — band-bucket pairs on the remainder,
    *      connected components, non-minima rejected
    *      ([[Dedup.nearDupClusters]]).
    *
    * Survivors are appended to `acceptedDir` (parquet, with an `xxh`
    * fingerprint column) and their MinHash signatures to the index at
    * `indexDir`; every rejection is appended to `rejectedDir` as
    * (doc_id, reason, witness, batch_id) for audit.
    *
    * Scale posture: ALL corpus state lives on storage, not executor
    * memory — the fingerprint set is a one-column pruned scan (8 bytes a
    * doc) and the dedup index stores (doc_id, sh, sig) exactly once (band
    * keys are re-derived at probe time, Dedup.writeIndex). Per batch the
    * incoming side is small: the anti-join and the band-bucket probe
    * shuffle corpus KEYS only, never document bodies, and the within-batch
    * cluster step runs on the batch alone. Backpressure comes from
    * `maxFilesPerTrigger`, the file-source analog of the reference's
    * bounded queue (data_ingestion.py:37). */
  def dedupGateStream(spark: SparkSession, docsDir: String, acceptedDir: String,
      indexDir: String, rejectedDir: String, checkpointDir: String,
      threshold: Double = 0.5, maxFilesPerTrigger: Option[Int] = None,
      availableNow: Boolean = false): StreamingQuery = {
    val reader = spark.readStream.schema(docsFileSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val writer = reader.parquet(docsDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupGateBatch(spark, batch, batchId, acceptedDir, indexDir,
          rejectedDir, threshold)
      }
    if (availableNow) writer.trigger(Trigger.AvailableNow()).start()
    else writer.start()
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One micro-batch of the dedup gate (also the batch-mode entry point —
    * callable directly to bulk-load a corpus through the same gate).
    * `exactPairs = true` pins both near-dup steps to the exact
    * inverted-postings pair joins ([[Dedup.ngramNearDups]] /
    * [[Dedup.probeIndexExact]]) instead of the MinHash band buckets — the
    * same pinned-vs-auto split as qDedupNgram vs qDedupAuto, so a
    * declared-exact gate result can never silently depend on LSH recall. */
  def dedupGateBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      acceptedDir: String, indexDir: String, rejectedDir: String,
      threshold: Double, exactPairs: Boolean = false): Unit = {
    val in = batch.withColumn("xxh", xxhash64(col("text"))).cache()
    try {
      // 1. exact within batch: min doc_id per text hash survives
      val wx = org.apache.spark.sql.expressions.Window
        .partitionBy(col("xxh")).orderBy(col("doc_id"))
      val ranked = in.withColumn("__rn", row_number().over(wx))
      val exactBatchRej = ranked.filter(col("__rn") > 1)
        .join(ranked.filter(col("__rn") === 1).select(col("xxh"),
          col("doc_id").as("witness")), Seq("xxh"))
        .select(col("doc_id"), lit("exact_batch").as("reason"), col("witness"))
      var live = ranked.filter(col("__rn") === 1).drop("__rn")

      // 2. exact vs corpus: anti-join on the accepted fingerprint column
      //    (pruned scan — only `xxh` and the witness id leave the parquet)
      val exactCorpusRej =
        if (!exists(spark, acceptedDir)) spark.emptyDataFrame
          .select(lit(0L).as("doc_id"), lit("").as("reason"), lit(0L).as("witness"))
          .limit(0)
        else {
          // batch hashes broadcast INTO the corpus scan, so the per-batch
          // cost is one pruned pass over (xxh, doc_id) with a broadcast
          // filter — never a full-corpus aggregate keyed on corpus size
          val seen = spark.read.parquet(acceptedDir).select(col("xxh"), col("doc_id"))
            .join(broadcast(live.select("xxh").distinct()), Seq("xxh"))
            .groupBy("xxh").agg(min(col("doc_id")).as("witness"))
          live.join(seen, Seq("xxh"))
            .select(col("doc_id"), lit("exact_corpus").as("reason"), col("witness"))
        }
      live = live.join(exactCorpusRej.select("doc_id"), Seq("doc_id"), "left_anti")

      // 3. near-dup vs corpus: band-bucket probe of the persisted index
      val nearCorpusRej =
        if (!exists(spark, indexDir)) exactCorpusRej.limit(0)
        else {
          val probed =
            if (exactPairs) Dedup.probeIndexExact(spark, indexDir, live, threshold)
            else Dedup.probeIndex(spark, indexDir, live, threshold)
          probed
            .groupBy(col("doc_a").as("doc_id"))
            .agg(min(col("doc_b")).as("witness"))
            .select(col("doc_id"), lit("near_dup_corpus").as("reason"), col("witness"))
        }
      live = live.join(nearCorpusRej.select("doc_id"), Seq("doc_id"), "left_anti")

      // 4. near-dup within batch: cluster the pair graph, keep minima
      val pairs = (if (exactPairs) Dedup.ngramNearDups(live, threshold)
        else Dedup.minhashNearDups(live, threshold)).select("doc_a", "doc_b")
      val nearBatchRej = Dedup.nearDupClusters(pairs)
        .filter(col("id") =!= col("label"))
        .select(col("id").as("doc_id"), lit("near_dup_batch").as("reason"),
          col("label").as("witness"))
      live = live.join(nearBatchRej.select("doc_id"), Seq("doc_id"), "left_anti")

      // publish: rejections audit, accepted rows, index signatures.
      // `live` is recomputed by each action below, but every input it
      // derives from is cached (`in`) or on disk, so the recompute is the
      // cheap narrow tail, and each write stays atomic-per-directory.
      exactBatchRej.unionByName(exactCorpusRej).unionByName(nearCorpusRej)
        .unionByName(nearBatchRej)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(rejectedDir)
      live.write.mode("append").parquet(acceptedDir)
      Dedup.appendIndex(live, indexDir)
    } finally { in.unpersist(); () }
  }

  private lazy val gateDir: String = Dedup.processTempDir("graft_dedup_gate")

  /** Oracle-gated two-batch run of the dedup gate (exactPairs pinned, like
    * qDedupNgram): the corpus plus planted exact copies (every 20th doc
    * re-planted in the SAME wave, every 30th in the OTHER wave) arrives as
    * two waves split by doc_id parity; the output is the full audit — one
    * row per doc, accepted or rejected with reason + witness + batch. The
    * DuckDB oracle replays all four rejection stages of both batches,
    * including the recursive-CTE connected components of the within-batch
    * near-dup steps. */
  def qDedupGate(s: SparkSession, d: String): DataFrame = {
    Dedup.rmTree(new java.io.File(gateDir))
    val docs = graft.engine.Tables.documents(s, d).select("doc_id", "text")
    val all = docs
      .unionByName(docs.filter(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(docs.filter(col("doc_id") % 30 === 0)
        .withColumn("doc_id", col("doc_id") + 1000001L))
    val (acc, idx, rej) =
      (s"$gateDir/accepted", s"$gateDir/index", s"$gateDir/rejected")
    Seq(0L, 1L).foreach { b =>
      dedupGateBatch(s, all.filter(col("doc_id") % 2 === b), b,
        acc, idx, rej, 0.5, exactPairs = true)
    }
    s.read.parquet(acc)
      .select(col("doc_id"), lit("accepted").as("status"),
        lit(null).cast("long").as("witness"), (col("doc_id") % 2).as("batch_id"))
      .unionByName(s.read.parquet(rej).select(col("doc_id"),
        col("reason").as("status"), col("witness"), col("batch_id")))
      .orderBy("doc_id", "status")
  }
}
