package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for q_pq_search (round-6 tuning). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.engine.GraftSession.local(16, "pq-probe")
    s.read.parquet(s"$d/region.parquet").count()
    val emb = graft.engine.Tables.embeddings(s, d)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("seed books")(Similarity.pqSeedCodebooks(emb))
    val books = t("train 2 iters")(Similarity.pqTrainCodebooks(emb, 2))
    t("encode corpus")(Similarity.pqEncode(emb, books).count())
    val panel = emb.filter(col("vec_id") < 20)
    t("brute force")(Similarity.bruteForceTopK(emb, panel, 10).count())
    t("adc topk")(Similarity.pqTopK(emb, panel, books, 10).count())
    t("refined topk")(Similarity.pqTopKRefined(emb, panel, books, 10, 5).count())
    t("full qPqSearch")(Similarity.qPqSearch(s, d).count())
    s.stop()
  }
}
