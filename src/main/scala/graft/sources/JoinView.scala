package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** Incrementally maintained equi-JOIN view between two [[SnapshotStore]]
  * tables — the denormalization half of IVM ([[RollupView]] owns the
  * aggregate half). The view materializes `L ⋈ R` on an equi-key pair
  * LIST (single or composite, pairwise positional equalities) and
  * absorbs source commits without re-running the join:
  *
  *   - append-only delta (the classic delta-join identity):
  *     Δ(L⋈R) = ΔL⋈R_new ∪ L_old⋈ΔR — the two terms are disjoint
  *     (L_old excludes ΔL) and together exactly the new rows. Each term
  *     joins a DELTA against a standing side with the standing side
  *     bloom-prefiltered by the delta's key tuples
  *     ([[RelationalOps.bloomFilteredJoinKeys]]): only standing rows
  *     whose key might match shuffle — O(Δ + matching), never
  *     O(standing).
  *   - retraction (a source lost rows to delete/upsert): the DIRTY join
  *     keys come from the sources' O(churn) change feeds; the view
  *     rewrites as (view ∖ dirty) ∪ (L_new ⋈ R_new restricted to dirty)
  *     — the expensive JOIN work is bounded by the dirty keys' rows,
  *     the rewrite cost by the view itself (no un-keyed store can
  *     retract cheaper), published as the view's own compaction.
  *   - a source compaction (or a vacuumed refresh baseline) invalidates
  *     the manifest diff: one full rebuild, same as [[RollupView]].
  *
  * The refresh position is ONE epoch stamp packing both source cursors
  * (`leftVer * 10^6 + rightVer`) into the view's manifest — crash-safe
  * the same way the rollup view is: the delta path publishes through
  * [[SnapshotStore.appendEpoch]] (a replayed refresh with the same
  * cursors is a true no-op), the rewrite paths through the
  * non-commutative compaction commit.
  *
  * Contract: paired keys share a dataType (the composite bloom hashes by
  * type — checked every refresh); the two schemas' non-key columns must
  * not collide, and a right key may share a name only with its OWN pair
  * (both checked at bootstrap); the view's rows are `l.* ++ r.*` minus
  * the right keys (each recoverable from its paired left key).
  */
object JoinView {

  private val CursorBase = 1000000L

  /** The epoch stamp a view refreshed through (leftVer, rightVer) carries
    * — the freshness probe the Catalyst join rewrite checks. */
  private[graft] def packedCursor(lv: Int, rv: Int): Long = pack(lv, rv)

  private def pack(lv: Int, rv: Int): Long = {
    require(lv < CursorBase && rv < CursorBase,
      s"source version beyond cursor capacity: $lv/$rv")
    lv * CursorBase + rv
  }

  private def cursors(viewRoot: String): (Int, Int) =
    SnapshotStore.lastEpoch(viewRoot)
      .map(e => ((e / CursorBase).toInt, (e % CursorBase).toInt))
      .getOrElse((0, 0))

  /** The view-shaped join on the full key list: conjunction of pairwise
    * equalities; the right side's key columns drop (each is recoverable
    * from its paired left key). */
  private def joined(l: DataFrame, r: DataFrame,
                     lks: Seq[String], rks: Seq[String]): DataFrame = {
    val cond = lks.zip(rks).map { case (a, b) => l(a) === r(b) }.reduce(_ && _)
    rks.foldLeft(l.join(r, cond))((df, k) => df.drop(r(k)))
  }

  /** The delta's distinct key tuples as __bk0.._bkN columns — ONE
    * checkpointed frame reused for the range-prune min/max, the bloom
    * build, and the dedup join. */
  private def keyTuples(delta: DataFrame, keys: Seq[String]): DataFrame =
    delta.select(keys.zipWithIndex.map { case (k, i) =>
      col(k).as(s"__bk$i")
    }: _*).distinct().localCheckpoint(true)

  /** standing ⋈ delta-keys, bloom-prefiltered on the composite key and
    * deduped by the equi-join against the distinct key tuples — the
    * [[RelationalOps.bloomFilteredJoinKeys]] pattern (its same-type
    * caller contract is enforced by [[refreshKeys]]); only
    * possibly-matching standing rows shuffle. */
  private def prefiltered(standing: DataFrame, standingKeys: Seq[String],
                          dk: DataFrame): DataFrame = {
    val bks = dk.columns.toSeq
    bks.foldLeft(
      RelationalOps.bloomFilteredJoinKeys(standing, dk,
        standingKeys.zip(bks)))((df, b) => df.drop(dk(b)))
  }

  /** Append/no-op commits only in (from, cur], with both endpoint
    * manifests alive (the manifest diff and the old-version read both
    * need them)? */
  private def appendOnly(root: String, from: Int, cur: Int): Boolean =
    SnapshotStore.hasManifest(root, from) &&
      SnapshotStore.hasManifest(root, cur) &&
      ((from + 1) to cur).forall(v =>
        SnapshotStore.manifestOp(root, v).contains("append"))

  /** Row-churn commits only (append/delete/upsert) — the change feed is
    * the row delta; a compaction or legacy manifest answers false. */
  private def churnOnly(root: String, from: Int, cur: Int): Boolean =
    SnapshotStore.hasManifest(root, from) &&
      SnapshotStore.hasManifest(root, cur) &&
      ((from + 1) to cur).forall(v =>
        SnapshotStore.manifestOp(root, v)
          .exists(op => op == "append" || op == "delete" || op == "upsert"))

  /** The standing side of a delta join, FILE-pruned by the delta's key
    * range when the standing store carries min/max stats on the join key
    * (appendWithStats / a z-ordered compaction): keys outside
    * [min(Δkeys), max(Δkeys)] cannot match, so only overlapping files
    * are read — with monotone ingest keys (the common fact-table shape)
    * a delta touches only the newest files of the other side. Statless
    * stores fall back to the full snapshot read (sound, just unpruned);
    * non-integral keys skip range pruning (the stats sidecar is
    * long-typed). The bloom row-prefilter still applies on top. */
  private def standing(spark: SparkSession, root: String, ver: Int,
                       keys: Seq[String], deltaKeys: DataFrame): DataFrame = {
    val full = SnapshotStore.read(spark, root, ver)
    // range pruning rides the FIRST key (the stats sidecar is per-column
    // long min/max); further keys still gate through the bloom + join
    val integral = full.schema(keys.head).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    if (!integral) full
    else {
      val mm = deltaKeys
        .agg(min(col("__bk0").cast("long")), max(col("__bk0").cast("long")))
        .head()
      if (mm.isNullAt(0)) full.limit(0) // empty delta: nothing can match
      else SnapshotStore.readWhere(spark, root, keys.head,
        mm.getLong(0), mm.getLong(1), ver)
    }
  }

  /** Single-key [[refreshKeys]]. */
  def refresh(spark: SparkSession, leftRoot: String, rightRoot: String,
              viewRoot: String, leftKey: String, rightKey: String): Int =
    refreshKeys(spark, leftRoot, rightRoot, viewRoot,
      Seq(leftKey), Seq(rightKey))

  /** Bring the view up to both sources' current versions — COMPOSITE
    * equi-keys supported (pairwise positional equalities). Returns the
    * view version (unchanged when both cursors already match). */
  def refreshKeys(spark: SparkSession, leftRoot: String, rightRoot: String,
                  viewRoot: String, leftKeys: Seq[String],
                  rightKeys: Seq[String]): Int = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key lists must be non-empty and pair up: $leftKeys vs $rightKeys")
    val lv = SnapshotStore.currentVersion(leftRoot)
    val rv = SnapshotStore.currentVersion(rightRoot)
    require(lv > 0 && rv > 0,
      s"both sources must have a published version ($leftRoot=$lv, $rightRoot=$rv)")
    val (plv, prv) = cursors(viewRoot)
    if (lv == plv && rv == prv) return SnapshotStore.currentVersion(viewRoot)
    require(lv >= plv && rv >= prv,
      s"source went backwards: ($plv,$prv) -> ($lv,$rv)")

    val lNew = SnapshotStore.read(spark, leftRoot, lv)
    val rNew = SnapshotStore.read(spark, rightRoot, rv)

    // per-refresh (schemas can evolve): paired keys must share a type —
    // the composite bloom hashes by type (xxhash64(1) != xxhash64(1L)),
    // and a mixed pair would silently DROP matching rows at the prefilter
    leftKeys.zip(rightKeys).foreach { case (lk, rk) =>
      val (lt, rt) = (lNew.schema(lk).dataType, rNew.schema(rk).dataType)
      require(lt == rt,
        s"paired join keys must share a dataType: $lk:$lt vs $rk:$rt")
    }

    if (plv == 0 && prv == 0) {
      // bootstrap: non-key column collision would corrupt every later
      // dirty anti-join — fail before the first version publishes
      val overlap =
        lNew.columns.toSet.intersect(rNew.columns.toSet) -- rightKeys
      require(overlap.isEmpty,
        s"non-key columns collide across the join view's sides: $overlap")
      // a right KEY named like an UNRELATED left column would make the
      // rewrite's by-name resolution serve the wrong column (the view
      // drops right keys): a shared name is legal only for a key and its
      // OWN pair
      leftKeys.zip(rightKeys).foreach { case (lk, rk) =>
        require(!lNew.columns.exists(_.equalsIgnoreCase(rk)) ||
            rk.equalsIgnoreCase(lk),
          s"right key '$rk' shadows an unrelated left column — rename one " +
            s"(a shared name is only legal for a key and its own pair)")
      }
      SnapshotStore.appendEpoch(
        joined(lNew, rNew, leftKeys, rightKeys), viewRoot, pack(lv, rv))
    } else if (appendOnly(leftRoot, plv, lv) && appendOnly(rightRoot, prv, rv)) {
      // Δ(L⋈R) = ΔL⋈R_new ∪ L_old⋈ΔR; standing sides bloom-prefiltered
      // by the in-hand delta's keys so only possibly-matching rows join
      val parts = Seq(
        if (lv > plv) {
          val delta = SnapshotStore.incremental(spark, leftRoot, plv, lv)
          val dk = keyTuples(delta, leftKeys)
          Some(joined(delta,
            prefiltered(standing(spark, rightRoot, rv, rightKeys, dk),
              rightKeys, dk),
            leftKeys, rightKeys))
        } else None,
        if (rv > prv) {
          val delta = SnapshotStore.incremental(spark, rightRoot, prv, rv)
          val dk = keyTuples(delta, rightKeys)
          Some(joined(
            prefiltered(standing(spark, leftRoot, plv, leftKeys, dk),
              leftKeys, dk),
            delta, leftKeys, rightKeys))
        } else None).flatten
      SnapshotStore.appendEpoch(
        parts.reduce(_ unionByName _), viewRoot, pack(lv, rv))
    } else if (churnOnly(leftRoot, plv, lv) && churnOnly(rightRoot, prv, rv)) {
      // retraction: dirty key tuples from both change feeds, join work
      // bounded by them; the view rewrites once (anti survivors + recompute)
      val dirty = keyTuples(
        SnapshotStore.changes(spark, leftRoot, plv, lv)
          .select(leftKeys.map(col): _*)
          .unionByName(SnapshotStore.changes(spark, rightRoot, prv, rv)
            .select(rightKeys.zip(leftKeys).map { case (rk, lk) =>
              col(rk).as(lk)
            }: _*)),
        leftKeys)
      def dirtyJoin(df: DataFrame, keys: Seq[String], how: String) =
        df.join(broadcast(dirty),
          keys.zipWithIndex.map { case (k, i) =>
            df(k) === dirty(s"__bk$i")
          }.reduce(_ && _), how)
      val survivors = dirtyJoin(
        SnapshotStore.read(spark, viewRoot), leftKeys, "left_anti")
      val recomputed = joined(
        dirtyJoin(lNew, leftKeys, "left_semi"),
        dirtyJoin(rNew, rightKeys, "left_semi"),
        leftKeys, rightKeys)
      SnapshotStore.compactWith(
        survivors.unionByName(recomputed), viewRoot,
        epochOverride = Some(pack(lv, rv)))
    } else {
      // a source compaction (or vacuumed baseline) broke the diff: rebuild
      SnapshotStore.compactWith(
        joined(lNew, rNew, leftKeys, rightKeys), viewRoot,
        epochOverride = Some(pack(lv, rv)))
    }
  }

  /** The maintained join content. */
  def read(spark: SparkSession, viewRoot: String): DataFrame =
    SnapshotStore.read(spark, viewRoot)
}
