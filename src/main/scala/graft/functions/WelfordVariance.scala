package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation surface (`Aggregator[IN, BUF, OUT]`): Welford's
  * online mean/variance. The reference has no UDAF (SURVEY §2.10); this is
  * the engine's demonstration that per-group custom state composes with
  * Catalyst aggregation — the buffer is merged associatively, so Spark
  * runs it as partial (map-side) + final aggregation like any built-in.
  *
  * Numerically stabler than the naive sum-of-squares at large counts; the
  * merge step is Chan et al.'s pairwise combination. Equivalence with
  * Spark's built-in avg/var_samp is asserted in FunctionsSpec.
  */
case class WelfordBuf(n: Long, mean: Double, m2: Double)
case class WelfordOut(n: Long, mean: Double, variance: Double)

object WelfordVariance extends Aggregator[Double, WelfordBuf, WelfordOut] {
  type Buf = WelfordBuf
  type Out = WelfordOut

  override def zero: Buf = WelfordBuf(0L, 0.0, 0.0)

  override def reduce(b: Buf, x: Double): Buf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    WelfordBuf(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      val mean = a.mean + delta * b.n / n
      val m2 = a.m2 + b.m2 + delta * delta * a.n * b.n / n
      WelfordBuf(n, mean, m2)
    }
  }

  override def finish(b: Buf): Out =
    WelfordOut(b.n, b.mean, if (b.n > 1) b.m2 / (b.n - 1) else Double.NaN)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[Out] = Encoders.product[WelfordOut]
}
