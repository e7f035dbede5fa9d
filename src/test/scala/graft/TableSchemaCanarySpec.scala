package graft

/** Schema canary for EVERY driver table — the generalization of
  * [[EventsReaderCanarySpec]] (VERDICT r4 item #3's lesson): round 4 lost
  * 16 queries because one column's physical encoding drifted under a
  * sandbox Spark/testdata refresh and nothing turned red by name. This
  * spec pins the AS-SCANNED Spark schema of all ten tables, so the next
  * regeneration or reader-behavior change flips a test that says exactly
  * which table and column moved.
  *
  * Timestamp columns are currently TIMESTAMP_NTZ (parquet
  * isAdjustedToUTC=false micros under Spark 4.1.2's native read) — if
  * this fires after an environment change, update [[graft.engine.Tables]]
  * normalization FIRST (events is the only table the engine re-types),
  * then re-pin here.
  */
class TableSchemaCanarySpec extends SparkSpec {

  private val expected = Map(
    "region" -> "r_regionkey:int, r_name:string",
    "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
      "c_acctbal:double, c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, p_type:string, " +
      "p_size:int, p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
      "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
      "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
      "l_discount:double, l_tax:double, l_returnflag:string, " +
      "l_linestatus:string, l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint, ts:timestamp_ntz, user_id:bigint, " +
      "event_type:string, value:double, props:string"),
    "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")

  test("all ten driver tables scan to the pinned schemas (drift canary)") {
    val drifted = expected.toSeq.sortBy(_._1).flatMap { case (t, exp) =>
      val got = spark.read.parquet(s"$sf0001/$t.parquet").schema
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      if (got != exp) Some(s"$t:\n  expected $exp\n  scanned  $got") else None
    }
    assert(drifted.isEmpty, "driver-table schema drift:\n" + drifted.mkString("\n"))
  }

  test("the engine's events reader re-types ts to session-zoned TimestampType") {
    // the one engine-side re-type: whatever the file encoding, downstream
    // operators must see TimestampType (EventsReaderCanarySpec pins values)
    assert(graft.engine.Tables.events(spark, sf0001).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }
}
