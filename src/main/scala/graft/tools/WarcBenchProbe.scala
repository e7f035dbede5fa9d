package graft.tools
import org.apache.spark.sql.functions._
object WarcBenchProbe {
  def main(args: Array[String]): Unit = {
    import graft.sources.WarcIngest
    val mult = if (args.nonEmpty) args(0).toInt else 30
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .crossJoin(spark.range(mult).toDF("r"))
      .select((col("doc_id") * mult + col("r")).as("doc_id"), col("lang"), col("source"),
        array_join(transform(split(trim(col("text")), "\\s+"),
          (w, i) => when(pmod(i + col("r").cast("int"), lit(5)) === 0,
            concat(w, col("r").cast("string"))).otherwise(w)), " ").as("text"))
      .localCheckpoint()
    println(s"[wp] docs=${docs.count()} partitions=${docs.rdd.getNumPartitions}")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[wp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val ds = docs.select(col("doc_id"), col("text")).as[(Long, String)]
    time("deser only") { ds.mapPartitions(_.map(_._1)).reduce(math.max) }
    time("grouped only") { ds.mapPartitions(_.grouped(50).map(_.length.toLong)).reduce(_ + _) }
    time("build only") { ds.mapPartitions(_.grouped(50).map(g => WarcIngest.buildWarcFile(g).length.toLong)).reduce(_ + _) }
    time("build+parse") { ds.mapPartitions(_.grouped(50).map(g => WarcIngest.parseWarcResponses(WarcIngest.buildWarcFile(g)).length.toLong)).reduce(_ + _) }
    time("build+parse again") { ds.mapPartitions(_.grouped(50).map(g => WarcIngest.parseWarcResponses(WarcIngest.buildWarcFile(g)).length.toLong)).reduce(_ + _) }
    spark.stop()
  }
}
