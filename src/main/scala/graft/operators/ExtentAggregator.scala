package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable-free aggregation buffer for [[ExtentAggregator]]. */
final case class ExtentBuf(
    n: Long,
    minVal: Double, minTs: Long,
    maxVal: Double, maxTs: Long,
    firstE: Long, lastE: Long)

/** Fused extents result — the flagship's per-band payload in one struct. */
final case class Extent(
    slice_len: Long,
    min_val: Double, min_ts: Long,
    max_val: Double, max_ts: Long,
    first_e: Long, last_e: Long)

/** Single-pass fused extents aggregate (SURVEY §4 custom-work item 1): the
  * flagship band payload — argmin, argmax, count, span — in ONE
  * `Aggregator` buffer instead of five separate aggregate expressions.
  * This is the UDAF/Aggregator extension point of the engine; built-ins
  * remain the correctness reference (same tie semantics as lexicographic
  * `min/max(struct(value, e))`: min breaks value ties toward the smaller
  * ts, max toward the larger).
  */
object ExtentAggregator extends Aggregator[(Double, Long), ExtentBuf, Extent] {

  override def zero: ExtentBuf =
    ExtentBuf(0L, Double.NaN, 0L, Double.NaN, 0L, Long.MaxValue, Long.MinValue)

  /** Spark SQL's double total order: NaN greater than everything and equal
    * to itself; -0.0 == 0.0. Plain `<`/`>` would freeze the buffer once a
    * NaN lands in it and diverge from the built-in struct ordering. */
  @inline private def cmp(a: Double, b: Double): Int = {
    val an = if (a == 0.0d) 0.0d else a
    val bn = if (b == 0.0d) 0.0d else b
    java.lang.Double.compare(an, bn)
  }
  @inline private def minWins(v: Double, e: Long, bv: Double, be: Long): Boolean = {
    val c = cmp(v, bv); c < 0 || (c == 0 && e < be)
  }
  @inline private def maxWins(v: Double, e: Long, bv: Double, be: Long): Boolean = {
    val c = cmp(v, bv); c > 0 || (c == 0 && e > be)
  }

  override def reduce(b: ExtentBuf, in: (Double, Long)): ExtentBuf = {
    val (v, e) = in
    if (b.n == 0L) ExtentBuf(1L, v, e, v, e, e, e)
    else ExtentBuf(
      b.n + 1L,
      if (minWins(v, e, b.minVal, b.minTs)) v else b.minVal,
      if (minWins(v, e, b.minVal, b.minTs)) e else b.minTs,
      if (maxWins(v, e, b.maxVal, b.maxTs)) v else b.maxVal,
      if (maxWins(v, e, b.maxVal, b.maxTs)) e else b.maxTs,
      math.min(b.firstE, e),
      math.max(b.lastE, e))
  }

  override def merge(a: ExtentBuf, b: ExtentBuf): ExtentBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else ExtentBuf(
      a.n + b.n,
      if (minWins(b.minVal, b.minTs, a.minVal, a.minTs)) b.minVal else a.minVal,
      if (minWins(b.minVal, b.minTs, a.minVal, a.minTs)) b.minTs else a.minTs,
      if (maxWins(b.maxVal, b.maxTs, a.maxVal, a.maxTs)) b.maxVal else a.maxVal,
      if (maxWins(b.maxVal, b.maxTs, a.maxVal, a.maxTs)) b.maxTs else a.maxTs,
      math.min(a.firstE, b.firstE),
      math.max(a.lastE, b.lastE))

  override def finish(b: ExtentBuf): Extent =
    Extent(b.n, b.minVal, b.minTs, b.maxVal, b.maxTs, b.firstE, b.lastE)

  override def bufferEncoder: Encoder[ExtentBuf] = Encoders.product[ExtentBuf]
  override def outputEncoder: Encoder[Extent] = Encoders.product[Extent]
}
