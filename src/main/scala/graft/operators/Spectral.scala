package graft.operators

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal component of the embedding corpus by POWER ITERATION —
  * the spectral primitive behind embedding whitening, ABTT-style
  * common-component removal (Mu & Viswanath 2018, "All-but-the-Top")
  * and PCA-based semantic dedup: corpora with one dominant direction
  * waste cosine resolution on it; the pipeline measures and removes it.
  *
  * Exactness protocol (the PageRank/DoReMi recipes combined):
  *  - embeddings quantize to integer MICROS (floor(x·1e6 + 0.5) — one
  *    IEEE multiply+floor, identical on any engine);
  *  - mean and centering are exact integer arithmetic (the one division
  *    per dim is sign-symmetric round-half-away-from-zero);
  *  - the 64x64 SCATTER matrix Σ c·cᵀ is exact integers (1e12 scale);
  *  - each power step u = S·v is exact integers; the L2 norm converts
  *    u to doubles and folds the 64 squares IN DIM ORDER (engine:
  *    foldLeft; oracle: list_reduce over list(... ORDER BY dim) — the
  *    ordered fold both engines replay bit-for-bit), sqrt is IEEE-exact;
  *  - the renormalized v is floor(u/‖u‖·1e6 + 0.5) micros.
  *
  * Scale shape: per-partition Long scatter partials (d² accumulators
  * riding the scan; a loud per-partition row-count guard fails BEFORE
  * Long wraparound — see [[MaxRowsPerPartition]]), combined via
  * treeAggregate into exact BigInt totals (driver memory O(d²)
  * regardless of partition count — the 100 TB form), then the
  * iteration runs on the d-sized vector driver-side.
  */
object Spectral {

  val Dim = 64
  val Iterations = 6
  /** Deflated components reported by [[qPcaK]] (Mu & Viswanath remove
    * the top D ≈ d/100 components; d=64 here, so D=3 exercises the
    * multi-component path at fixture scale). */
  val TopK = 3
  /** Per-partition row cap for the Long scatter accumulators: each
    * row adds at most (2e6)² = 4e12 per cell (|centered micros| ≤ 2e6
    * for inputs in [-1, 1]), and Long.MaxValue ≈ 9.22e18, so wraparound
    * starts near 9.22e18 / 4e12 ≈ 2.3e6 rows/partition. The guard
    * throws loudly at the bound instead of silently wrapping into a
    * hash mismatch; repartition the input to stay under it. */
  val MaxRowsPerPartition: Long = 2300000L
  private val M = BigInt(1000000L)

  /** Sign-symmetric round-half-away-from-zero integer division (b > 0)
    * — portable where floor-division (DuckDB) and truncation (JVM)
    * disagree on negatives. */
  def halfDiv(a: BigInt, b: BigInt): BigInt =
    if (a.signum >= 0) (2 * a + b) / (2 * b) else -((2 * (-a) + b) / (2 * b))

  /** Integer micros of one component (float widens exactly). */
  def micros(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  /** The driver-side iteration over an exact BigInt scatter matrix.
    * Returns (loadings in micros, scatter eigenvalue estimate). */
  def powerIteration(scatter: Array[BigInt], iterations: Int = Iterations): (Array[Long], Long) = {
    var v = Array.fill(Dim)(M)
    var t = 0
    while (t < iterations) {
      val u = Array.tabulate(Dim) { j =>
        var acc = BigInt(0); var k = 0
        while (k < Dim) { acc += scatter(j * Dim + k) * v(k); k += 1 }
        acc
      }
      // ordered fold of the 64 squared doubles — both engines replay it
      val norm = math.sqrt(u.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      // degenerate scatter (empty/constant corpus): no dominant
      // direction — report the zero vector instead of NaN junk
      if (norm == 0.0) return (Array.fill(Dim)(0L), 0L)
      v = u.map(x => BigInt(math.floor(x.toDouble / norm * 1e6 + 0.5).toLong))
      t += 1
    }
    // Rayleigh quotient of the final direction: vᵀSv / vᵀv, exact
    // integers then ONE rounded division (half-up at integer scale)
    var num = BigInt(0); var den = BigInt(0)
    var j = 0
    while (j < Dim) {
      var acc = BigInt(0); var k = 0
      while (k < Dim) { acc += scatter(j * Dim + k) * v(k); k += 1 }
      num += v(j) * acc
      den += v(j) * v(j)
      j += 1
    }
    val eig = if (den.signum == 0) 0L
      else math.floor(num.toDouble / den.toDouble + 0.5).toLong
    (v.map(_.toLong), eig)
  }

  /** Oracle-checked top component: quantize -> exact integer mean/center
    * -> exact scatter -> 6 power steps -> (dim, loading_micros,
    * scatter_eig). The oracle replays every step in HUGEINT with the
    * same ordered-fold norms. */
  def qPca(s: SparkSession, d: String): DataFrame =
    topComponent(Tables.rebalance(Tables.embeddings(s, d), "vec_id"))

  /** [[qPca]] over any frame carrying an `embedding` column. */
  def topComponent(embeddings: DataFrame): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    val (_, loadings, eig) = fit(embeddings)
    (0 until Dim).map(j => (j, loadings(j), eig))
      .toDF("dim", "loading_micros", "scatter_eig")
      .orderBy("dim")
  }

  /** Quantize -> exact mean -> exact scatter -> power iteration; returns
    * (mean micros, loading micros, scatter eigenvalue). */
  def fit(embeddings: DataFrame): (Array[Long], Array[Long], Long) = {
    val (mean, scatter, n) = meanAndScatter(embeddings)
    if (n == 0) return (Array.fill(Dim)(0L), Array.fill(Dim)(0L), 0L)
    val (loadings, eig) = powerIteration(scatter)
    (mean, loadings, eig)
  }

  /** The two exact passes shared by every spectral query: quantize to
    * micros, exact integer mean, exact BigInt scatter. Per-partition
    * Long partials (guarded against wraparound — [[MaxRowsPerPartition]])
    * combine via treeAggregate, so driver memory stays O(d²) however
    * many partitions the scan has. Returns (mean micros, d² scatter,
    * row count); on an empty corpus the scatter is all zeros. */
  def meanAndScatter(embeddings: DataFrame): (Array[Long], Array[BigInt], Long) = {
    val s = embeddings.sparkSession
    import s.implicits._
    val rows = embeddings
      .select(col("embedding").cast("array<double>")).as[Array[Double]]
      .map(_.map(micros))
    // pass 1: per-partition (sums, count) partials, treeAggregate'd into
    // exact BigInt totals
    val (sums, n) = rows.mapPartitions { it =>
      val acc = new Array[Long](Dim); var n = 0L
      it.foreach { v => var j = 0; while (j < Dim) { acc(j) += v(j); j += 1 }; n += 1 }
      if (n == 0) Iterator.empty else Iterator.single((acc, n))
    }.rdd.treeAggregate((Array.fill(Dim)(BigInt(0)), 0L))(
      seqOp = { case ((acc, cnt), (p, pn)) =>
        var j = 0; while (j < Dim) { acc(j) += BigInt(p(j)); j += 1 }; (acc, cnt + pn)
      },
      combOp = { case ((a, na), (b, nb)) =>
        var j = 0; while (j < Dim) { a(j) += b(j); j += 1 }; (a, na + nb)
      })
    if (n == 0)
      return (Array.fill(Dim)(0L), Array.fill(Dim * Dim)(BigInt(0)), 0L)
    val mean = Array.tabulate(Dim)(j => halfDiv(sums(j), BigInt(n)).toLong)
    // pass 2: per-partition scatter partials (Long-safe up to the
    // guarded ~2.3e6 rows/partition — each product is <= 4e12)
    val meanB = s.sparkContext.broadcast(mean)
    val scatter = rows.mapPartitions { it =>
      val m = meanB.value
      val acc = new Array[Long](Dim * Dim)
      var rowsSeen = 0L
      it.foreach { v =>
        rowsSeen += 1
        if (rowsSeen > MaxRowsPerPartition)
          throw new IllegalStateException(
            s"Spectral scatter partial: partition exceeds $MaxRowsPerPartition rows — " +
              "Long accumulators would wrap (each row adds up to 4e12/cell). " +
              "Repartition the embedding scan to smaller partitions.")
        val c = new Array[Long](Dim)
        var j = 0
        while (j < Dim) { c(j) = v(j) - m(j); j += 1 }
        var a = 0
        while (a < Dim) {
          val ca = c(a); var b = 0
          while (b < Dim) { acc(a * Dim + b) += ca * c(b); b += 1 }
          a += 1
        }
      }
      if (rowsSeen > 0) Iterator.single(acc) else Iterator.empty
    }.rdd.treeAggregate(Array.fill(Dim * Dim)(BigInt(0)))(
      seqOp = { (acc, p) =>
        var i = 0; while (i < Dim * Dim) { acc(i) += BigInt(p(i)); i += 1 }; acc
      },
      combOp = { (a, b) =>
        var i = 0; while (i < Dim * Dim) { a(i) += b(i); i += 1 }; a
      })
    (mean, scatter, n)
  }

  /** All-but-the-Top (Mu & Viswanath 2018) common-component removal:
    * center each embedding, project out the learned top component, and
    * report the scalar projection plus the residual norm — the QC frame
    * a whitening pass emits (a corpus whose projections dominate its
    * residuals is spending its cosine resolution on one direction).
    * Same exactness protocol as the fit: integer micros end to end, the
    * two divisions per value sign-symmetric half-away, the residual
    * norm an ordered fold + IEEE sqrt. Narrow per-vector work; the
    * component is a 64-long broadcast. */
  def qAbtt(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (mean, loadings, _) = fit(Tables.rebalance(Tables.embeddings(s, d), "vec_id"))
    val den = loadings.map(v => BigInt(v) * BigInt(v)).sum
    val meanB = s.sparkContext.broadcast(mean)
    val vB = s.sparkContext.broadcast(loadings)
    // the per-vector pass is NARROW — it rides the scan unrebalanced, so
    // no exchange ever carries the embedding array (the fit's internal
    // exchanges execute eagerly above and are not part of this plan)
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, e) =>
        val m = meanB.value; val v = vB.value
        val c = Array.tabulate(Dim)(j => micros(e(j)) - m(j))
        var num = BigInt(0)
        var j = 0
        while (j < Dim) { num += BigInt(c(j)) * BigInt(v(j)); j += 1 }
        // degenerate component (zero vector): nothing to remove
        val proj = if (den.signum == 0) 0L else halfDiv(num * 1000000L, den).toLong
        var acc = 0.0
        j = 0
        while (j < Dim) {
          val r = (BigInt(c(j)) -
            (if (den.signum == 0) BigInt(0) else halfDiv(num * BigInt(v(j)), den))).toDouble
          acc += r * r // ordered fold: ascending dim
          j += 1
        }
        (id, proj, math.floor(math.sqrt(acc) + 0.5).toLong)
      }
      .toDF("vec_id", "proj_micros", "resid_norm_micros")
      .orderBy("vec_id")
  }

  /** Top-k components by ROUNDED RANK-1 DEFLATION: after each power
    * solve, subtract round(λ·v·vᵀ / 1e12) from the scatter (v is in
    * micros, so v·vᵀ/1e12 is the unit outer product; λ is the INTEGER
    * Rayleigh quotient halfDiv(vᵀSv, vᵀv)) and iterate on the residual
    * matrix — Hotelling deflation with every step exactly replayable:
    * the only roundings are the two sign-symmetric half-away divisions,
    * so engine BigInt and oracle HUGEINT agree bit for bit. Returns
    * (loadings micros, eigenvalue) per component, largest first. */
  def deflatedComponents(scatter0: Array[BigInt], k: Int): Seq[(Array[Long], Long)] = {
    val t12 = BigInt(10).pow(12)
    val s = scatter0.clone()
    (0 until k).map { _ =>
      val (v, _) = powerIteration(s)
      // exact integer Rayleigh quotient on the CURRENT (deflated) matrix
      var num = BigInt(0); var den = BigInt(0)
      var j = 0
      while (j < Dim) {
        var acc = BigInt(0); var kk = 0
        while (kk < Dim) { acc += s(j * Dim + kk) * BigInt(v(kk)); kk += 1 }
        num += BigInt(v(j)) * acc
        den += BigInt(v(j)) * BigInt(v(j))
        j += 1
      }
      val eig = if (den.signum == 0) BigInt(0) else halfDiv(num, den)
      // deflate: S ← S − round(λ · v vᵀ / 1e12)
      var a = 0
      while (a < Dim) {
        var b = 0
        while (b < Dim) {
          s(a * Dim + b) -= halfDiv(eig * BigInt(v(a)) * BigInt(v(b)), t12)
          b += 1
        }
        a += 1
      }
      (v.clone(), eig.toLong)
    }
  }

  /** FULL All-but-the-Top (Mu & Viswanath 2018, the complete form):
    * remove the top [[TopK]] deflated components from every centered
    * vector IN ORDER — qAbtt removes only the top-1; the paper removes
    * D ≈ d/100 directions, and with d-scale corpora that is a multi-
    * component pass. Per vector: c ← c − round(⟨c,vᵢ⟩·vᵢ / ‖vᵢ‖²) for
    * i = 0..k−1 (each update one sign-symmetric half-away division per
    * coordinate, exactly replayable), reporting each scalar projection
    * and the final residual norm (ordered fold + IEEE sqrt). Narrow
    * per-vector work; the k components are a k·d broadcast. Output
    * columns are fixed to TopK = 3 projections (coupled to the oracle's
    * generated column list). */
  def qAbttK(s: SparkSession, d: String): DataFrame =
    abttK(Tables.embeddings(s, d))

  /** [[qAbttK]] over any frame carrying (vec_id, embedding). */
  def abttK(embeddings: DataFrame): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    val (mean, scatter, _) =
      meanAndScatter(Tables.rebalance(embeddings, "vec_id"))
    val comps = deflatedComponents(scatter, TopK).map(_._1).toArray
    val dens = comps.map(v => v.map(x => BigInt(x) * BigInt(x)).sum)
    val meanB = s.sparkContext.broadcast(mean)
    val compB = s.sparkContext.broadcast(comps)
    val denB = s.sparkContext.broadcast(dens)
    // narrow per-vector pass, the qAbtt shape: the fit's exchanges ran
    // eagerly above, no exchange here ever carries the embedding array
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, e) =>
        val m = meanB.value; val vs = compB.value; val ds = denB.value
        val c = Array.tabulate(Dim)(j => BigInt(micros(e(j)) - m(j)))
        val projs = new Array[Long](vs.length)
        var i = 0
        while (i < vs.length) {
          val v = vs(i); val den = ds(i)
          var num = BigInt(0); var j = 0
          while (j < Dim) { num += c(j) * BigInt(v(j)); j += 1 }
          // degenerate component (zero vector): nothing to remove
          projs(i) = if (den.signum == 0) 0L else halfDiv(num * 1000000L, den).toLong
          if (den.signum != 0) {
            j = 0
            while (j < Dim) { c(j) -= halfDiv(num * BigInt(v(j)), den); j += 1 }
          }
          i += 1
        }
        var acc = 0.0
        var j = 0
        while (j < Dim) { val r = c(j).toDouble; acc += r * r; j += 1 } // ordered fold
        (id, projs(0), projs(1), projs(2), math.floor(math.sqrt(acc) + 0.5).toLong)
      }
      .toDF("vec_id", "proj0_micros", "proj1_micros", "proj2_micros", "resid_norm_micros")
      .orderBy("vec_id")
  }

  /** Oracle-checked top-[[TopK]] principal components by power iteration
    * + rounded rank-1 deflation — the multi-component form All-but-the-
    * Top actually calls for (Mu & Viswanath remove the top D ≈ d/100
    * directions, not just one). Output: (component, dim, loading_micros,
    * scatter_eig); the eigenvalue column here is the INTEGER Rayleigh
    * quotient (half-away division), unlike q_pca's double-rounded
    * single-component estimate. The oracle unrolls all k·Iterations
    * power steps plus the k−1 deflation joins in HUGEINT. */
  def qPcaK(s: SparkSession, d: String): DataFrame =
    topComponentsK(Tables.rebalance(Tables.embeddings(s, d), "vec_id"), TopK)

  /** [[qPcaK]] over any frame carrying an `embedding` column. */
  def topComponentsK(embeddings: DataFrame, k: Int): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    val (_, scatter, _) = meanAndScatter(embeddings)
    deflatedComponents(scatter, k).zipWithIndex.flatMap { case ((v, eig), c) =>
      (0 until Dim).map(j => (c, j, v(j), eig))
    }.toDF("component", "dim", "loading_micros", "scatter_eig")
      .orderBy("component", "dim")
  }
}
