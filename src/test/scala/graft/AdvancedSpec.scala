package graft

import graft.operators.Advanced
import org.apache.spark.sql.functions._

/** Skew/salting and sketch behaviors not expressible as DuckDB oracles. */
class AdvancedSpec extends SparkSpec {

  test("salted join == plain join (skew mitigation preserves semantics)") {
    import spark.implicits._
    // skewed probe: 90% of rows hit key 1
    val probe = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong))
      .toDF("k", "payload")
    val build = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"), (6L, "x"))
      .toDF("k", "v")
    val plain = probe.join(build, Seq("k"))
      .select("k", "payload", "v").collect().map(_.toSeq).toSet
    val salted = Advanced.saltedJoin(probe, build, "k", "payload", 8)
      .select("k", "payload", "v").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("approx_count_distinct lands within rsd of the exact count") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }
}
