package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized rollup over a [[SnapshotStore]]
  * series table — incremental view maintenance (IVM) reduced to its
  * mergeable-aggregate core, the reference's re-aggregate-on-append loop
  * (trend-o-meter:258-266 recomputes per-day aggregates when samples
  * arrive) lifted to the batch corpus layer.
  *
  * The view's stored rows are PARTIAL aggregates per (metric, day):
  * `(cnt, vsum DECIMAL, vmin, vmax)` — count/sum/min/max are all
  * commutative monoids, so a refresh only aggregates the DELTA the
  * source's newer manifests introduced and appends those partials as a
  * new view version. Nothing re-reads the standing corpus:
  *
  *   - refresh cost:  O(delta)            (not O(table), not O(view))
  *   - read cost:     O(partial rows)     (one merge groupBy)
  *   - compact cost:  O(view)             (folds partials to one row/key)
  *
  * At 100 TB this is the difference between a nightly full recompute and
  * a minutes-long delta pass: the source appends a few GB, the refresh
  * aggregates exactly those files (manifest-planned, no listing, no
  * diff), and the view's own store compacts on whatever cadence keeps
  * the partial-row count bounded. Decimal sums keep the merge EXACT in
  * any order (IEEE doubles would drift under re-association), which is
  * what makes the view bit-equal to a from-scratch rollup — the property
  * the oracle checks.
  *
  * Resume position: each refresh stamps the processed SOURCE version into
  * the view's manifest as the epoch id ([[SnapshotStore.appendEpoch]]),
  * so a re-run of the same refresh is a no-op (exactly-once maintenance
  * on top of at-least-once scheduling) and the next refresh knows where
  * to cut. A source COMPACTION between refreshes replaces directories
  * without changing rows — an incremental read across it would
  * double-count — so refresh detects the dropped-directory signature and
  * falls back to one full rebuild published as a view compaction (same
  * stamp mechanics, documented cost O(table) for that refresh only).
  */
object RollupView {

  /** Fixed partial-sum type: wide enough that re-merging compacted
    * partials stays exact (values fit well inside 28 integer digits), and
    * FIXED so every version's parquet schema is identical — Spark's sum
    * widens decimal precision per aggregation level, and a store whose
    * versions disagree on the sum type would not union. */
  private val SumType = "decimal(30,2)"

  /** Delta rows → one partial row per (metric, day). Day is exact integer
    * division of epoch seconds (portable: DuckDB `//`, Spark `div`). */
  private def partials(delta: DataFrame): DataFrame =
    delta
      .groupBy(col("metric"), expr("e div 86400").as("day"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(SumType)).cast(SumType).as("vsum"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))

  /** Bring the view up to the source's current version. Returns the view
    * version published (or current, when already up to date). */
  def refresh(spark: SparkSession, srcRoot: String, viewRoot: String): Int = {
    val srcCur = SnapshotStore.currentVersion(srcRoot)
    require(srcCur > 0, s"no published source version at $srcRoot")
    val from = SnapshotStore.lastEpoch(viewRoot).map(_.toInt).getOrElse(0)
    if (srcCur <= from) return SnapshotStore.currentVersion(viewRoot)
    val curDirs = SnapshotStore.manifestDirs(srcRoot, srcCur).toSet
    // A vacuumed from-manifest means the counted baseline is gone — the
    // manifest diff cannot be computed, so take the same full-rebuild
    // branch a compaction takes (instead of crashing on every retry and
    // wedging the view until manual repair).
    val baselineGone = from > 0 && !SnapshotStore.hasManifest(srcRoot, from)
    val beforeDirs =
      if (from == 0 || baselineGone) Set.empty[String]
      else SnapshotStore.manifestDirs(srcRoot, from).toSet
    if (baselineGone || beforeDirs.exists(d => !curDirs.contains(d))) {
      // a compaction replaced directories we already counted: the manifest
      // diff is no longer the row delta — rebuild once, publish as the
      // view's own compaction (sole content), stamp the new position
      val full = partials(SnapshotStore.read(spark, srcRoot, srcCur))
      if (SnapshotStore.currentVersion(viewRoot) == 0)
        SnapshotStore.appendEpoch(full, viewRoot, srcCur)
      else
        SnapshotStore.compactWith(full, viewRoot,
          epochOverride = Some(srcCur.toLong))
    } else {
      val delta = SnapshotStore.incremental(spark, srcRoot, from, srcCur)
      SnapshotStore.appendEpoch(partials(delta), viewRoot, srcCur)
    }
  }

  /** The materialized rollup: merge all stored partials. Output carries
    * both the exact decimal sum (`vsum`) and the compare-friendly double
    * projections the registry's portable-rounding rule wants. */
  def read(spark: SparkSession, viewRoot: String): DataFrame =
    SnapshotStore.read(spark, viewRoot)
      .groupBy("metric", "day")
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("vsum")).cast(SumType).as("vsum"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))

  /** Fold the accumulated partial rows down to one row per (metric, day),
    * published as a view compaction — bounds the merge cost of [[read]]
    * after many refreshes. Logical content (and the resume stamp) are
    * unchanged. */
  def compact(spark: SparkSession, viewRoot: String): Int =
    SnapshotStore.compactWith(read(spark, viewRoot), viewRoot)
}
