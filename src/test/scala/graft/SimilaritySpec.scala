package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality gates: LSH and IVF recall measured against the brute-force
  * exact top-k on sf0.001. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def neighborSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("cosine column matches a scala-side computation") {
    val row = emb.limit(2).select("embedding").collect()
    val (a, b) = (row(0).getSeq[Float](0), row(1).getSeq[Float](0))
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    import spark.implicits._
    val got = Seq((a, b)).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("brute-force top-k is exact and deterministic") {
    val t1 = Similarity.bruteForceTopK(emb, queries, 10).collect().map(_.toSeq)
    val t2 = Similarity.bruteForceTopK(emb, queries, 10).collect().map(_.toSeq)
    assert(t1.sameElements(t2))
    assert(t1.length === 20 * 10)
  }

  test("IVF recall beats its scan fraction (the index earns its keep)") {
    val nprobe = 5
    val nlists = emb.select("label").distinct().count().toInt
    val truth = neighborSets(Similarity.bruteForceTopK(emb, queries, 10))
    val ivf = neighborSets(Similarity.ivfTopK(emb, queries, "label", 10, nprobe))
    val recalls = truth.map { case (q, t) => ivf.getOrElse(q, Set.empty).intersect(t).size / 10.0 }
    val mean = recalls.sum / recalls.size
    val scanFraction = nprobe.toDouble / nlists
    info(f"IVF mean recall@10 = $mean%.2f at scan fraction $scanFraction%.2f")
    // random-scanning nprobe/nlists of the corpus would get ~scanFraction
    // recall; the centroid routing must do meaningfully better
    assert(mean >= scanFraction + 0.1, f"IVF recall $mean%.2f")
  }

  test("k-means-trained IVF lists: deterministic, and recall beats scan fraction") {
    val k = 8
    val assigned = Similarity.kmeansAssign(emb, k, 2)
    val again = Similarity.kmeansAssign(emb, k, 2)
    assert(assigned.orderBy("vec_id").collect().map(_.toSeq).toSeq ===
      again.orderBy("vec_id").collect().map(_.toSeq).toSeq)
    val nLists = assigned.select("list_id").distinct().count()
    assert(nLists >= 2 && nLists <= k)

    val corpus = emb.drop("label")
      .join(assigned.select(col("vec_id"), col("list_id")), Seq("vec_id"))
    val nprobe = 3
    val truth = neighborSets(Similarity.bruteForceTopK(emb, queries, 10))
    val queriesWithList = corpus.filter(col("vec_id") < 20)
    val ivf = neighborSets(
      Similarity.ivfTopK(corpus, queriesWithList, "list_id", 10, nprobe))
    val recalls = truth.map { case (q, t) => ivf.getOrElse(q, Set.empty).intersect(t).size / 10.0 }
    val mean = recalls.sum / recalls.size
    info(f"trained-IVF mean recall@10 = $mean%.2f at nprobe=$nprobe/$nLists lists")
    assert(mean > nprobe.toDouble / nLists)
  }

  test("LSH: multi-table candidates give real recall at a small scan fraction") {
    val truth = neighborSets(Similarity.bruteForceTopK(emb, queries, 10))
    val lsh = neighborSets(Similarity.lshTopK(emb, queries, 10))
    val recalls = truth.map { case (q, t) => lsh.getOrElse(q, Set.empty).intersect(t).size / 10.0 }
    val mean = recalls.sum / recalls.size
    // expected candidate fraction ~ LshTables / 2^LshBits (~5%)
    info(f"LSH mean recall@10 = $mean%.2f")
    assert(mean >= 0.15, f"LSH recall $mean%.2f")
    // per-(table,bucket) occupancy stays small vs the corpus
    val maxBucket = Similarity.lshKeys(emb).groupBy("tbl", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket < emb.count() / 8)
  }
}
