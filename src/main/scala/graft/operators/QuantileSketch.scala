package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** A stored, mergeable quantile summary: the Greenwald–Khanna `(value, g,
  * delta)` tuples plus the absorbed count. `stats` is ascending by value;
  * every query is answerable from this alone. */
case class QuantileTierSketch(count: Long, stats: Seq[QStat])
case class QStat(value: Double, g: Long, delta: Long)

/** Mergeable quantile summaries — the third member of the sketch-tier
  * family (a26 = HLL distinct tier, a34 = Misra–Gries frequency tier):
  * "p99 per metric-hour at 100 TB" served from stored per-minute sketches,
  * with the raw samples long gone — exactly the quantile analogue of the
  * a26 contract (counts/sums merge associatively; quantiles do NOT, so the
  * tier must store a mergeable summary, not the percentile itself).
  *
  * Built on Spark's own Greenwald–Khanna implementation
  * (`org.apache.spark.sql.catalyst.util.QuantileSummaries` — the engine
  * behind `percentile_approx`), wrapped in two Aggregator levels exactly
  * like [[HeavyHitters]]: level-1 folds raw values into a summary per fine
  * bucket; level-2 union-merges stored summaries into coarser buckets (the
  * GK merge from the same "Mergeable Summaries" literature as the MG
  * combine). Each task ships one O(1/eps) summary regardless of row count.
  *
  * Guarantees: a query at rank phi returns a value whose true rank is
  * within ±eps·N — preserved by the merge (bounds pinned by
  * QuantileSketchSpec). EXACTNESS REGIME (what the gate row uses): when
  * `eps < 1/(2N)` the compress band is below one rank, so no sample is
  * ever dropped and `query(phi)` returns the exact sample at 1-based rank
  * `ceil(phi*N)` (min/max-clamped at the extremes) — deterministic and
  * SQL-expressible, the same "exact below the sketch's budget" story as
  * a34's below-cap MG counts. Production callers pass a real eps (1e-2 …
  * 1e-4) and get bounded-memory summaries instead.
  */
object QuantileSketch {

  private def enc[T: TypeTag](): Encoder[T] = ExpressionEncoder[T]()

  private def empty(eps: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  private def toSketch(qs: QuantileSummaries): QuantileTierSketch = {
    val c = qs.compress()
    QuantileTierSketch(c.count,
      c.sampled.toSeq.map(s => QStat(s.value, s.g, s.delta)))
  }

  private def fromSketch(s: QuantileTierSketch, eps: Double): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, eps,
      s.stats.map(x => QuantileSummaries.Stats(x.value, x.g, x.delta)).toArray,
      s.count, true)

  /** GK merge. COMPRESS BEFORE ANY COUNT CHECK: `count` excludes samples
    * still sitting in the insert head buffer (it only advances on flush),
    * so an un-compressed summary with data can report count == 0 — an
    * emptiness guard on the raw objects would silently drop a whole
    * partition's samples. compress() flushes the head (after which count
    * is truthful) and is what merge() requires of its inputs anyway. */
  private def mergeQs(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries = {
    val ac = a.compress()
    val bc = b.compress()
    if (ac.count == 0) bc else if (bc.count == 0) ac else ac.merge(bc)
  }

  /** Level-1: raw doubles → stored summary. */
  private class BuildAgg(eps: Double)
      extends Aggregator[Double, QuantileSummaries, QuantileTierSketch] {
    override def zero: QuantileSummaries = empty(eps)
    override def reduce(b: QuantileSummaries, v: Double): QuantileSummaries =
      b.insert(v)
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      mergeQs(a, b)
    override def finish(b: QuantileSummaries): QuantileTierSketch = toSketch(b)
    // The GK object carries a private insert head buffer that must survive
    // partial serialization — ship the whole object. Kryo, not Java
    // serialization: the buffer is also the STREAMING AGGREGATION STATE of
    // the quantile tier's streaming twin, where one serialized buffer per
    // (metric, minute) key lives in the state store — Java serialization's
    // per-object class descriptors priced each near-empty sketch at ~600 B
    // and dominated the replay's state I/O; Kryo is ~6x smaller.
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[QuantileTierSketch] = enc()
  }

  /** Level-2: union-merge stored summaries (the tier combine). */
  private class MergeAgg(eps: Double)
      extends Aggregator[QuantileTierSketch, QuantileSummaries, QuantileTierSketch] {
    override def zero: QuantileSummaries = empty(eps)
    override def reduce(b: QuantileSummaries, s: QuantileTierSketch): QuantileSummaries =
      mergeQs(b, fromSketch(s, eps))
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      mergeQs(a, b)
    override def finish(b: QuantileSummaries): QuantileTierSketch = toSketch(b)
    // Kryo for the same state-size reason as [[BuildAgg]].
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[QuantileTierSketch] = enc()
  }

  /** GK summary of a double column: struct<count, stats array<struct<value,
    * g, delta>>>. */
  def summary(value: Column, eps: Double): Column =
    udaf(new BuildAgg(eps), Encoders.scalaDouble)(value)

  /** Union-merge of summary columns produced by [[summary]] (or by
    * [[merged]] itself — the GK combine keeps its guarantee under
    * arbitrary merge trees). A udaf with a Product input encoder takes one
    * parameter PER FIELD, so the sketch struct is passed as its fields. */
  def merged(sketches: Column, eps: Double): Column =
    udaf(new MergeAgg(eps), enc[QuantileTierSketch]())(
      sketches.getField("count"), sketches.getField("stats"))

  /** Query a stored sketch column for one quantile. Model-sized input (one
    * summary row per group), so a udf is the right tool — the hot path is
    * the aggregation, not this. */
  def quantile(sketch: Column, eps: Double, phi: Double): Column = {
    val f = udf((r: Row) => {
      val s = QuantileTierSketch(r.getLong(0),
        r.getSeq[Row](1).map(x => QStat(x.getDouble(0), x.getLong(1), x.getLong(2))))
      fromSketch(s, eps).query(phi)
    })
    f(sketch)
  }

  /** Test/driver-side reference path (mirrors [[HeavyHitters.summarize]]):
    * fold values with the exact reduce the aggregator runs. */
  private[graft] def summarize(values: Iterator[Double], eps: Double): QuantileTierSketch =
    toSketch(values.foldLeft(empty(eps))(_.insert(_)))
  private[graft] def combine(a: QuantileTierSketch, b: QuantileTierSketch,
                             eps: Double): QuantileTierSketch =
    toSketch(mergeQs(fromSketch(a, eps), fromSketch(b, eps)))
  private[graft] def queryLocal(s: QuantileTierSketch, eps: Double,
                                phi: Double): Option[Double] =
    fromSketch(s, eps).query(phi)
}
