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

  test("selection-based exact percentiles equal the percentile aggregate bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Advanced
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    def aggP(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.agg(expr(s"percentile(x, array(${ps.mkString(",")}))"))
        .head().getSeq[Double](0).toSeq
    // real data with fractional interpolation positions
    val real = graft.engine.Tables.lineitem(spark, sf0001)
      .select(col("l_extendedprice").cast("double").as("x"))
    assert(Advanced.exactPercentilesBySelection(real, ps) === aggP(real))
    // adversarial tiny frames: n = 1..7, heavy ties, negatives, nulls
    Seq(
      Seq[java.lang.Double](5.0),
      Seq[java.lang.Double](1.0, 2.0),
      Seq[java.lang.Double](3.0, 1.0, 2.0, 2.0, 2.0),
      Seq[java.lang.Double](-1.5, 7.25, 0.0, null, 3.3, 3.3, 9.9)
    ).foreach { vs =>
      val df = vs.toDF("x")
      assert(Advanced.exactPercentilesBySelection(df, ps) === aggP(df), vs.toString)
    }
  }
}
