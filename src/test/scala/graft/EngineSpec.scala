package graft

import graft.engine.Snapshot
import graft.operators.Mutations
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Engine conventions: atomic snapshot store and source/sink round trips
  * (the reference's dead JSON-file path, SURVEY §2.1 S8, generalized). */
class EngineSpec extends SparkSpec {

  test("snapshot store: publish, read, mutate, crash-safety of versions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_snap").toString
    val store = new Snapshot(spark, root)
    assert(store.currentVersion().isEmpty)
    intercept[IllegalStateException] { store.read() }

    val v0 = store.publish(Seq((1L, "Active"), (2L, "Active")).toDF("id", "status"))
    assert(v0 === "v_0" && store.read().count() === 2)

    // mutation = pure transform + publish (expiry-sweep style)
    val v1 = store.mutate(df =>
      df.withColumn("status", when(col("id") === 1L, "Expired").otherwise(col("status"))))
    assert(v1 === "v_1")
    assert(store.read().filter(col("status") === "Expired").count() === 1)

    // the previous version is still intact on disk (time travel / crash safety)
    assert(spark.read.parquet(s"$root/v_0").filter(col("status") === "Expired").count() === 0)

    // composing with the mutation operators
    store.mutate(df => Mutations.deleteWhere(df, col("id") === 2L))
    assert(store.read().count() === 1)
  }

  test("JSON and CSV sinks/sources round-trip the documents table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val expected = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq

    val jsonDir = Files.createTempDirectory("graft_json").toString + "/docs"
    docs.write.json(jsonDir)
    val fromJson = spark.read.schema(docs.schema).json(jsonDir)
    assert(fromJson.orderBy("doc_id").collect().map(_.toSeq).toSeq === expected)

    val csvDir = Files.createTempDirectory("graft_csv").toString + "/docs"
    docs.write.option("header", "true").option("quoteAll", "true").csv(csvDir)
    val fromCsv = spark.read.schema(docs.schema).option("header", "true").csv(csvDir)
    assert(fromCsv.orderBy("doc_id").collect().map(_.toSeq).toSeq === expected)
  }
}
