package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import RollupView.{Day, Grain}

/** Incrementally-maintained DISTINCT-COUNT rollup over a [[SnapshotStore]]
  * series table: per (metric, grain-bucket) the view stores a MERGEABLE
  * HyperLogLog sketch (Spark's DataSketches `hll_sketch_agg`), not a
  * number — the lakehouse answer to "unique users per day over 100 TB",
  * where exact NDV needs a full shuffle of every distinct key and a
  * COUNT(DISTINCT) dashboard re-pays it on every query. Sketch partials
  * are a commutative monoid under `hll_union_agg` (per-register max), so
  * the view maintains with the SAME engine as the classic rollup
  * ([[RollupView.refreshWith]] — one [[RollupView.PartialSpec]] instance):
  *
  *   - refresh cost:  O(delta) — only the source's new manifests sketch
  *   - read cost:     O(partial rows) — one union-merge groupBy, then a
  *                    constant-time estimate per group
  *   - accuracy:      lgK = 12 → ~1.6% relative standard error,
  *                    4 KiB per group ceiling
  *
  * Because HLL register state is a per-register MAX over the hashed item
  * stream, the union of per-delta sketches is bit-identical in estimate
  * to a single-pass sketch of the final rows — incremental maintenance
  * loses nothing vs a rebuild (the spec asserts estimate equality), and
  * merge order never matters.
  *
  * RETRACTION: a sketch is strictly monotone — a deleted user un-derives
  * nothing (registers only grow), so deletes/upserts take the engine's
  * dirty-group path: groups that LOST rows re-sketch from the current
  * source (O(dirty-groups' rows), day-range pre-pruned like the classic
  * view) and replace by key; vanished groups tombstone (`cnt = 0`, null
  * sketch — `hll_union_agg` skips nulls, [[read]] filters zero-count
  * groups). This is not a workaround but the only correct maintenance for
  * any monotone summary; the engine already owned that path.
  *
  * The estimate itself is approximate, so the registered query follows the
  * repo's approx-surface contract (`table_profile_scale_verify`): exact
  * NDV travels next to the estimate, the band verdict derives
  * independently in both engines over the SAME exported estimate, and the
  * Spark side hard-fails out-of-band before anything exports.
  */
object NdvView {

  /** Engine constant: sketch precision (2^12 registers). Fixed so every
    * version's sketches stay union-compatible — `hll_union_agg(sk, false)`
    * rejects mixed-lgK stores loudly rather than silently degrading. */
  val LgK = 12

  private[sources] object NdvSpec extends RollupView.PartialSpec {
    def bucketed(rows: DataFrame, g: Grain): DataFrame =
      rows.select(col("metric"),
        expr(s"e div ${g.seconds}").as(g.col), col("user_id"))
    def fold(rows: DataFrame, g: Grain): DataFrame =
      rows
        .groupBy(col("metric"), col(g.col))
        .agg(
          count(lit(1)).as("cnt"),
          expr(s"hll_sketch_agg(user_id, $LgK)").as("sk"))
    def tombstones(keys: DataFrame, recomputed: DataFrame, g: Grain): DataFrame =
      keys.select(col("metric"), col(g.col),
        lit(0L).as("cnt"), lit(null).cast(BinaryType).as("sk"))
  }

  /** Bring the NDV view up to the source's current version (the shared
    * IVM engine with the sketch spec). Returns the view version
    * published. */
  def refresh(spark: SparkSession, srcRoot: String, viewRoot: String,
              grain: Grain = Day): Int =
    RollupView.refreshWith(spark, srcRoot, viewRoot, grain, NdvSpec)

  /** Merge partial rows to one row per (metric, bucket) WITHOUT
    * estimating — the compaction content (sketches stay sketches so the
    * store keeps its mergeability). */
  private def mergedOf(partials: DataFrame, grain: Grain): DataFrame =
    partials
      .groupBy(col("metric"), col(grain.col))
      .agg(
        sum(col("cnt")).as("cnt"),
        expr("hll_union_agg(sk, false)").as("sk"))
      // zero-count groups are retraction tombstones — logically absent
      .where(col("cnt") > 0)

  private def merged(spark: SparkSession, viewRoot: String,
                     grain: Grain): DataFrame =
    mergedOf(SnapshotStore.read(spark, viewRoot), grain)

  /** The estimate projection of a merged-sketch frame. */
  private def estimated(m: DataFrame, grain: Grain): DataFrame =
    m.select(col("metric"), col(grain.col),
      expr("hll_sketch_estimate(sk)").as("approx_users"))

  /** The served answer: estimated distinct users per (metric, bucket). */
  def read(spark: SparkSession, viewRoot: String,
           grain: Grain = Day): DataFrame = {
    RollupView.requireGrain(viewRoot, grain, "read")
    estimated(merged(spark, viewRoot, grain), grain)
  }

  /** DELTA-COMPENSATED content of a STALE NDV view: when the view's
    * stamp lags the source's current version and every gap commit is an
    * APPEND, the current estimate is the stored sketches unioned with
    * the GAP rows' sketches folded on the fly — and because HLL register
    * state is a per-item MAX, that union is BIT-EQUAL in estimate to a
    * refresh-then-read (not merely within the error band; the same
    * associativity the refresh itself relies on). Retraction is the one
    * thing a monotone sketch cannot compensate — a churned or compacted
    * gap, a vacuumed baseline, or a stampless view returns None and the
    * caller falls back to the base plan; an already-fresh view returns
    * the plain read. Cost: O(partials + Δ). */
  def compensatedRead(spark: SparkSession, srcRoot: String,
                      viewRoot: String, grain: Grain = Day): Option[DataFrame] = {
    RollupView.requireGrain(viewRoot, grain, "compensatedRead")
    val from = SnapshotStore.lastEpoch(viewRoot).map(_.toInt).getOrElse(return None)
    val srcCur = SnapshotStore.currentVersion(srcRoot)
    if (srcCur < from) return None
    if (srcCur == from) return Some(read(spark, viewRoot, grain))
    if (!JoinView.appendOnly(srcRoot, from, srcCur)) return None
    val delta = SnapshotStore.incremental(spark, srcRoot, from, srcCur)
    Some(estimated(mergedOf(
      SnapshotStore.read(spark, viewRoot)
        .unionByName(NdvSpec.fold(NdvSpec.bucketed(delta, grain), grain)),
      grain), grain))
  }

  /** Fold accumulated partial rows to one sketch row per key (published
    * as a view compaction; tombstones fold away physically). */
  def compact(spark: SparkSession, viewRoot: String,
              grain: Grain = Day): Int = {
    RollupView.requireGrain(viewRoot, grain, "compact")
    SnapshotStore.compactWith(merged(spark, viewRoot, grain), viewRoot)
  }
}
