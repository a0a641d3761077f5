package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A reported heavy hitter: `count` is the summary estimate ĉ with the
  * Misra–Gries guarantee ĉ ≤ true ≤ ĉ + N/(cap+1) over the N items the
  * summary has absorbed. */
case class TermCount(term: String, count: Long)

/** Mergeable heavy-hitters (frequent-items) summaries — the frequency
  * member of the sketch family (a9 = HLL distinct + GK quantiles, a26 =
  * mergeable HLL tier): "top domains/terms at 100 TB" without shipping one
  * row per distinct term through the shuffle the way the exact
  * `text_top_terms` aggregation must.
  *
  * Algorithm: Misra–Gries summaries with the mergeable-summaries combine
  * (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries",
  * PODS 2012): pointwise-add two summaries, and if more than `cap` items
  * remain, subtract the (cap+1)-th largest count from every entry and drop
  * the non-positive ones. Misra–Gries is the mergeable dual of SpaceSaving
  * (SpaceSaving's estimate is the MG estimate plus its per-item error
  * offset; the PODS'12 merge is stated on the MG form). It is chosen over
  * CountMinSketch because the summary itself ENUMERATES the candidate
  * items — CMS answers point queries but cannot list heavy hitters without
  * a second pass over the whole domain.
  *
  * Guarantees (classic MG, preserved by the PODS'12 merge):
  *   - ĉ ≤ true ≤ ĉ + N/(cap+1) for every item;
  *   - every item with true count > N/(cap+1) is present in the summary;
  *   - if total distinct items ≤ cap, no eviction ever fires anywhere and
  *     every count is EXACT — which is what lets the gate row compare
  *     against the exact-count oracle, while eviction/merge bounds are
  *     pinned by HeavyHittersSpec.
  *
  * Scale shape: the Aggregator buffer IS the map-side combine — each task
  * ships one O(cap) summary regardless of row count, so a global top-k
  * shuffles O(partitions × cap) entries versus the exact path's
  * O(distinct terms). The two-level form (per-group summaries, then
  * [[merged]] across groups) is the same mergeable-tier contract as a26's
  * per-minute HLL sketches union-merged into hours.
  */
object HeavyHitters {

  /** Pointwise sum of two summaries (no cap applied). */
  private def add(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap

  /** PODS'12 cap step: subtract the (cap+1)-th largest count, drop ≤ 0.
    * At most `cap` entries can exceed that threshold, so the result fits. */
  private def capped(sum: Map[String, Long], cap: Int): Map[String, Long] =
    if (sum.size <= cap) sum
    else {
      val vs = sum.values.toArray
      java.util.Arrays.sort(vs)
      val thresh = vs(sum.size - cap - 1)
      sum.collect { case (k, v) if v > thresh => k -> (v - thresh) }
    }

  /** Deterministic summary rendering: (count desc, term asc). */
  private def rendered(b: Map[String, Long]): Seq[TermCount] =
    b.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => TermCount(t, c) }

  private def enc[T: TypeTag](): Encoder[T] = ExpressionEncoder[T]()

  /** Level-1 aggregator: raw term stream → MG summary. */
  private class InsertAgg(cap: Int)
      extends Aggregator[String, Map[String, Long], Seq[TermCount]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
      b.get(term) match {
        case Some(c)              => b.updated(term, c + 1L)
        case None if b.size < cap => b.updated(term, 1L)
        // classic MG decrement-all: the new item and one unit of every
        // counter annihilate (O(cap), amortized O(1) per absorbed unit)
        case None => b.collect { case (k, v) if v > 1L => k -> (v - 1L) }
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      capped(add(a, b), cap)
    override def finish(b: Map[String, Long]): Seq[TermCount] = rendered(b)
    override def bufferEncoder: Encoder[Map[String, Long]] = enc()
    override def outputEncoder: Encoder[Seq[TermCount]] = enc()
  }

  /** Level-2 aggregator: union-merge already-built summaries (the tier
    * combine — inputs are level-1 outputs). */
  private class MergeAgg(cap: Int)
      extends Aggregator[Seq[TermCount], Map[String, Long], Seq[TermCount]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], s: Seq[TermCount]): Map[String, Long] =
      capped(add(b, s.iterator.map(t => t.term -> t.count).toMap), cap)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      capped(add(a, b), cap)
    override def finish(b: Map[String, Long]): Seq[TermCount] = rendered(b)
    override def bufferEncoder: Encoder[Map[String, Long]] = enc()
    override def outputEncoder: Encoder[Seq[TermCount]] = enc()
  }

  /** MG summary of a string column: array<struct<term,count>> sorted
    * (count desc, term asc), at most `cap` entries. */
  def summary(term: Column, cap: Int): Column =
    udaf(new InsertAgg(cap), Encoders.STRING)(term)

  /** Union-merge of summary columns produced by [[summary]] (or by
    * [[merged]] itself — the combine is associative in its guarantee). */
  def merged(summaries: Column, cap: Int): Column =
    udaf(new MergeAgg(cap), enc[Seq[TermCount]]())(summaries)

  /** Test/driver-side reference path: summarize an in-memory stream with
    * the exact reduce/merge the aggregators run, so specs can pin the
    * bounds without a Spark job per property. */
  private[graft] def summarize(items: Iterator[String], cap: Int): Map[String, Long] = {
    val agg = new InsertAgg(cap)
    items.foldLeft(agg.zero)(agg.reduce)
  }
  private[graft] def combine(a: Map[String, Long], b: Map[String, Long],
                             cap: Int): Map[String, Long] =
    capped(add(a, b), cap)
}
