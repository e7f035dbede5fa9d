package graft.streaming

import graft.operators.{Mutations, SnippetGen}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Command-dispatch loop (SURVEY §2.9 T1-T4): the reference drains a
  * bounded FIFO `Queue(maxsize=40)` one item at a time, routing on
  * `action_code` 0 remove-doc / 1 upload-doc / 2 add-category /
  * 3 remove-category (data_ingestion.py:37,46-72).
  *
  * Engine model: a command is a ROW; a batch of commands is a DataFrame;
  * the dispatcher is a pure function `(state, commands) -> (state',
  * messages)`. In streaming mode the same function runs inside
  * `foreachBatch`, which is exactly the reference's micro-batch drain with
  * real backpressure (`maxFilesPerTrigger`/`maxOffsetsPerTrigger` instead
  * of a blocking queue).
  *
  * Batch ordering convention: within one batch, categories are added first,
  * then uploads, then document removals, then category removals (cascade).
  * The reference's strict FIFO interleaving across types is a single-queue
  * artifact; per-type ordering preserves its observable semantics for
  * non-conflicting batches and is documented engine behavior for
  * conflicting ones.
  */
object CommandDispatch {

  /** Engine state: flat documents + derived flat snippets + category dim. */
  case class EngineState(docs: DataFrame, snippets: DataFrame, categories: DataFrame)

  /** Command-row schema (payload union of the 4 enqueue shapes,
    * data_ingestion.py:75-107). */
  val commandSchema: StructType = StructType(Seq(
    StructField("action_code", IntegerType, nullable = false),
    StructField("document_id", LongType, nullable = true),
    StructField("document_name", StringType, nullable = true),
    StructField("category_id", IntegerType, nullable = true),
    StructField("category_name", StringType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** Pure dispatch: route one command batch into the mutation set.
    * Returns the next state and one message row per command (the
    * reference's concatenated status report, data_ingestion.py:47-72,
    * as data instead of a string). */
  def dispatch(state: EngineState, commands: DataFrame): (EngineState, DataFrame) = {
    val cmds = commands.cache()

    // 2: add categories (uniqueness on name, M7)
    val catAdds = cmds.filter(col("action_code") === 2)
      .select(col("category_id"), col("category_name"))
    val cats1 = Mutations.dimInsert(state.categories, catAdds, "category_name")

    // 1: uploads — dedup on name (M1/J3), dim lookup (J1), snippet gen (F3/F4)
    val uploads = cmds.filter(col("action_code") === 1)
      .select(col("document_id"), col("document_name"), col("category_id"), col("text"))
    val newDocs = uploads
      .join(broadcast(cats1.select(col("category_id"), col("category_name"))), Seq("category_id"), "left")
      .withColumn("document_status", lit("Active"))
      .select("document_id", "document_name", "category_id", "category_name",
        "text", "document_status")
    // the accepted set is computed ONCE and drives both the docs append and
    // snippet generation — so a within-batch duplicate name contributes
    // exactly one doc row and one snippet set (no orphan snippets)
    val acceptedDocs = Mutations.acceptedNew(state.docs, newDocs, "document_name")
    val docs1 = state.docs.unionByName(acceptedDocs)
    val newSnippets = acceptedDocs
      .select(col("document_id"), col("document_name"), col("category_id"),
        col("document_status"),
        explode(SnippetGen.snippetWindows(SnippetGen.splitWords(col("text")))).as("s"))
      .select(col("document_id"), col("document_name"), col("category_id"),
        col("s.snippet_id").as("snippet_id"), col("s.snippet_text").as("snippet_text"),
        col("document_status"))
    val snippets1 = state.snippets.unionByName(newSnippets)

    // 0: remove documents by name (M4/M8) — cascade to snippets
    val removeNames = cmds.filter(col("action_code") === 0).select("document_name")
    val docs2 = Mutations.deleteKeys(docs1, removeNames, "document_name")
    val snippets2 = Mutations.deleteKeys(snippets1, removeNames, "document_name")

    // 3: remove categories (M5) — cascade to docs + snippets
    val removeCats = cmds.filter(col("action_code") === 3).select("category_id")
    val cats2 = Mutations.deleteKeys(cats1, removeCats, "category_id")
    val docs3 = Mutations.deleteKeys(docs2, removeCats, "category_id")
    val snippets3 = Mutations.deleteKeys(snippets2, removeCats, "category_id")

    // status messages (C3 analog), one per command
    val existingNames = state.docs.select(col("document_name").as("n")).distinct()
    val existingCats = state.categories.select(col("category_name").as("cn")).distinct()
    val messages = cmds
      .join(existingNames, cmds("document_name") === col("n"), "left")
      .join(existingCats, cmds("category_name") === col("cn"), "left")
      .select(col("action_code"), col("document_name"), col("category_name"),
        when(col("action_code") === 1 && col("n").isNotNull,
            format_string("Document %s already exists", col("document_name")))
          .when(col("action_code") === 1,
            format_string("Document %s was uploaded", col("document_name")))
          .when(col("action_code") === 0,
            format_string("Document %s was removed", col("document_name")))
          .when(col("action_code") === 2 && col("cn").isNotNull,
            format_string("Category %s already exists", col("category_name")))
          .when(col("action_code") === 2,
            format_string("Category %s was added", col("category_name")))
          .when(col("action_code") === 3,
            format_string("Category %d was removed", col("category_id")))
          .otherwise(lit("Unknown action"))
          .as("message"))
    (EngineState(docs3, snippets3, cats2), messages)
  }

  /** Oracle-checked batch demo: seed state from the test tables (documents
    * as docs with category = doc_id % 5 over the region dim), apply one
    * command batch exercising all four action codes plus both dedup
    * rejections, return the resulting docs table. */
  def qDispatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs0 = graft.engine.Tables.documents(s, d).select(
      col("doc_id").as("document_id"),
      concat(lit("doc_"), col("doc_id")).as("document_name"),
      (col("doc_id") % 5).cast("int").as("category_id"),
      lit(null).cast("string").as("category_name"),
      col("text"),
      lit("Active").as("document_status"))
    val cats0 = graft.engine.Tables.region(s, d).select(
      col("r_regionkey").cast("int").as("category_id"), col("r_name").as("category_name"))
    val snippets0 = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("document_id", LongType), StructField("document_name", StringType),
        StructField("category_id", IntegerType), StructField("snippet_id", IntegerType),
        StructField("snippet_text", StringType), StructField("document_status", StringType))))
    val commands = Seq(
      (2, None: Option[Long], None: Option[String], Some(10), Some("NEWCAT"), None: Option[String]),
      (2, None, None, Some(11), Some("AFRICA"), None), // dup category -> rejected
      (1, Some(9001L), Some("doc_new"), Some(2), None, Some("alpha beta gamma delta epsilon zeta eta")),
      (1, Some(9002L), Some("doc_7"), Some(1), None, Some("duplicate name upload")), // rejected
      (0, None, Some("doc_3"), None, None, None),
      (3, None, None, Some(4), None, None)
    ).toDF("action_code", "document_id", "document_name", "category_id", "category_name", "text")
    val (next, _) = dispatch(EngineState(docs0, snippets0, cats0), commands)
    next.docs.select("document_id", "category_id").orderBy("document_id")
  }

  /** Streaming mode: run the dispatcher inside foreachBatch over a command
    * stream, persisting each state snapshot under `stateDir/<batchId>/`
    * (idempotent per batch id — re-running a batch overwrites the same
    * snapshot, giving the reference's rollback intent via atomic dirs,
    * SURVEY §7.4). `onBatch` receives the post-batch state for inspection.
    */
  def runStream(spark: SparkSession, commands: DataFrame, initial: EngineState,
      stateDir: String, onBatch: (Long, EngineState) => Unit): StreamingQuery = {
    var state = initial
    commands.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (next, messages) = dispatch(state, batch)
        // materialize snapshots so state does not re-read mutated streams
        val dir = s"$stateDir/$batchId"
        next.docs.write.mode("overwrite").parquet(s"$dir/docs")
        next.snippets.write.mode("overwrite").parquet(s"$dir/snippets")
        next.categories.write.mode("overwrite").parquet(s"$dir/categories")
        messages.write.mode("overwrite").parquet(s"$dir/messages")
        state = EngineState(
          spark.read.parquet(s"$dir/docs"),
          spark.read.parquet(s"$dir/snippets"),
          spark.read.parquet(s"$dir/categories"))
        onBatch(batchId, state)
      }
      .start()
  }
}
