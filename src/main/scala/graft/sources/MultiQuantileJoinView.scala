package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained APPROXIMATE-QUANTILE over an N-WAY JOIN
  * TREE — the last cell of the {agg, ndv, quantile} × {single-table,
  * two-table, N-way} materialized-view matrix: [[QuantileJoinView]]'s
  * signed global-frozen-bin histogram composed with
  * [[MultiAggJoinView]]'s telescoped tree-delta machinery.
  *
  * {{{ SELECT g…, approx_quantile(x, φ…) FROM T0 JOIN T1 ON … JOIN T2 … GROUP BY g… }}}
  *
  * Storage and serving are the two-table view's contract VERBATIM — one
  * signed count per (group, bin) under ONE globally frozen edge set
  * (`_jedges/v<viewV>` sidecar), estimates by cumulative-bin selection +
  * linear interpolation ([[QuantileJoinView.estimatesFrom]]) — so
  * [[quantiles]] and [[compact]] simply DELEGATE. What is new is
  * maintenance: each refresh folds the telescoping identity
  *
  *   J(new…) − J(old…) = Σᵢ [ J(new_<i, new_i, old_>i) − J(new_<i, old_i, old_>i) ]
  *
  * into signed BIN partials instead of sum/count partials. Because the
  * global freeze makes the bin a function of the VALUE alone, every
  * per-table term — append delta at +1, churn legs at ±1 restricted to
  * the table's O(churn) dirty key tuples — is pure signed arithmetic:
  * group movement is mass transfer, unchanged rows cancel, and N-way
  * churn needs NO dirty-group recompute (the property that forces
  * [[MultiNdvJoinView]]'s re-sketch does not bite — signed counts
  * retract). Every standing side of every term is restricted by the
  * semi-join cascade outward from the moved table along the tree
  * ([[MultiAggJoinView.termFrames]] — bloom-prefiltered and file-pruned
  * per edge, exact for trees), so at 100 TB a dim delta touches only the
  * fact files its keys can live in.
  *
  * Envelope discipline is the parents' union:
  *   - any POSITIVE leg (append delta or churn new-leg) ESCAPING the
  *     frozen envelope → one full rebuild that REFREEZES with the margin
  *     doubled (capped) — the [[QuantileView]] amortization;
  *   - a freeze over zero non-null values is REFUSED loudly (NULL edges
  *     would silently poison every later bin);
  *   - a source compaction / vacuumed baseline → full rebuild at the
  *     default margin.
  *
  * All of a refresh's terms land in ONE append stamped with the N-way
  * cursor ([[MultiAggJoinView.stampFor]] — packed while it fits, the
  * variable-width sidecar past that), so a crashed refresh replays as an
  * epoch no-op and the rebuild's refrozen edges stay keyed by the view
  * version their publish creates (orphans from a crash are dropped by
  * the next non-rebuild publish — the [[QuantileView]] protocol).
  *
  * NULL measure values never bin on any path, including the oracle
  * replay (`quantile_cont` semantics). Contract: inner equi-joins over a
  * TREE ([[MultiAggJoinView.Edge]]); group columns and the value column
  * resolve on exactly one table (child-side keys excluded); the spec
  * arguments of every refresh repeat the bootstrap's verbatim.
  */
object MultiQuantileJoinView {
  import MultiAggJoinView.Edge

  /** Leg-sign column of the fused churn fold (see refresh). */
  private val SignCol = "__mqj_sign"

  val DefaultBins: Int = QuantileJoinView.DefaultBins
  val DefaultMargin: Double = QuantileJoinView.DefaultMargin
  val MaxMargin: Double = QuantileJoinView.MaxMargin

  private def specLine(n: Int, edges: Seq[Edge], groups: Seq[String],
                       x: String, bins: Int): String = {
    def lc(xs: Seq[String]) = xs.map(_.toLowerCase(java.util.Locale.ROOT))
    val es = edges.map(e =>
      s"${e.parent}:${lc(e.parentKeys).mkString(",")}:${lc(e.childKeys).mkString(",")}")
      .mkString("|")
    s"n=$n;e=$es;g=${lc(groups).sorted.mkString(",")};" +
      s"v=${x.toLowerCase(java.util.Locale.ROOT)};b=$bins;p=1"
  }

  private def recordedSpec(viewRoot: String): Option[String] = {
    val p = java.nio.file.Paths.get(viewRoot, "_mqjspec")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  private def recordSpec(viewRoot: String, line: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(viewRoot))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(viewRoot, "_mqjspec"), line.getBytes("UTF-8"))
  }

  /** Bring the view up to every source's current version; returns the
    * view version (unchanged when all cursors already match). Spec
    * arguments must repeat the bootstrap's verbatim. */
  def refresh(spark: SparkSession, roots: Seq[String], viewRoot: String,
              edges: Seq[Edge], groupCols: Seq[String], valueCol: String,
              bins: Int = DefaultBins): Int = {
    val n = roots.size
    MultiAggJoinView.validateTree(roots, edges, groupCols)
    require(bins >= 2, s"need at least 2 bins, got $bins")
    groupCols.find(g => Seq("bin", "cnt").exists(_.equalsIgnoreCase(g)))
      .foreach(g => sys.error(s"group column '$g' collides with a partial column"))

    val curVs = roots.map(SnapshotStore.currentVersion).toIndexedSeq
    curVs.zip(roots).foreach { case (v, r) =>
      require(v > 0, s"every source must have a published version ($r=$v)")
    }
    val prevVs = MultiAggJoinView.cursors(viewRoot, n).toIndexedSeq
    if (curVs == prevVs) return SnapshotStore.currentVersion(viewRoot)
    curVs.zip(prevVs).zip(roots).foreach { case ((cv, pv), r) =>
      require(cv >= pv, s"source went backwards at $r: $pv -> $cv")
    }
    val spec = specLine(n, edges, groupCols, valueCol, bins)
    if (prevVs.exists(_ != 0)) {
      val rec = recordedSpec(viewRoot).getOrElse("")
      require(rec == spec,
        s"view at $viewRoot is maintained with spec '$rec', refresh asked '$spec'")
    }

    val rootsV = roots.toIndexedSeq
    val newFrames = rootsV.zip(curVs)
      .map { case (r, v) => SnapshotStore.readEvolved(spark, r, v) }
    MultiAggJoinView.validateResolution(newFrames, edges,
      groupCols :+ valueCol)
    // every branch publishes at curVs — one stamp (wide mode writes its
    // vector sidecar here, BEFORE any publish)
    val stamp = MultiAggJoinView.stampFor(viewRoot, curVs)

    val adj = MultiAggJoinView.adjacency(n, edges)
    def slice(frames: IndexedSeq[DataFrame]): DataFrame =
      MultiAggJoinView.joinedSlice(frames, edges, groupCols, Seq(valueCol))

    // per-table term builders — the MultiAggJoinView telescoping, with
    // the fold deferred to the caller (bins, not sums)
    def versFor(i: Int): IndexedSeq[Int] =
      rootsV.indices.map(j => if (j < i) curVs(j) else prevVs(j)).toIndexedSeq
    def deltaTermRows(i: Int): DataFrame = {
      val delta = SnapshotStore.incremental(spark, rootsV(i),
        prevVs(i), curVs(i), Some(newFrames(i).schema))
      slice(MultiAggJoinView.termFrames(spark, rootsV, n, adj, i, delta,
        versFor(i)))
    }
    def restrictionKeys(i: Int): Seq[String] =
      if (i == 0) edges.head.parentKeys else edges(i - 1).childKeys
    def churnLegRows(i: Int, dirty: JoinView.DeltaKeys, ver: Int): DataFrame = {
      val myKeys = restrictionKeys(i)
      val restricted = JoinView.prefiltered(
        JoinView.standing(spark, rootsV(i), ver, myKeys, dirty),
        myKeys, dirty)
      slice(MultiAggJoinView.termFrames(spark, rootsV, n, adj, i,
        restricted, versFor(i)))
    }
    def dirtyOf(i: Int): JoinView.DeltaKeys = {
      val myKeys = restrictionKeys(i)
      JoinView.keyTuples(
        SnapshotStore.changes(spark, rootsV(i), prevVs(i), curVs(i))
          .select(myKeys.map(col): _*), myKeys)
    }
    // BOTH churn legs of table i in ONE term build (the MultiAggJoinView
    // fused-churn shape): the old and new restrictions share the dirty
    // keys, so pinning their UNION — old rows carrying sign −1, new +1 —
    // builds ONE cascade, ONE join tree and ONE checkpoint where the
    // two-leg shape paid all three twice. The cascade restriction by the
    // union's keys is a superset of each leg's; restriction is pure
    // pruning, so the join stays exact, and the signed fold sums to the
    // same (group, bin) mass as the separate ± folds. None when the gap
    // evolved the table's schema mid-churn — the caller falls back to
    // the honest two-leg shape.
    def churnUnionRows(i: Int, dirty: JoinView.DeltaKeys): Option[DataFrame] = {
      val myKeys = restrictionKeys(i)
      def restricted(ver: Int) = JoinView.prefiltered(
        JoinView.standing(spark, rootsV(i), ver, myKeys, dirty),
        myKeys, dirty)
      val old = restricted(prevVs(i)); val nw = restricted(curVs(i))
      if (old.columns.toSeq != nw.columns.toSeq) None
      else Some(MultiAggJoinView.joinedSlice(
        MultiAggJoinView.termFrames(spark, rootsV, n, adj, i,
          old.withColumn(SignCol, lit(-1L))
            .unionByName(nw.withColumn(SignCol, lit(1L))),
          versFor(i)),
        edges, groupCols, Seq(valueCol, SignCol)))
    }
    val moved = rootsV.indices.filter(i => curVs(i) > prevVs(i))
    def appendMoved(i: Int): Boolean =
      JoinView.appendOnly(rootsV(i), prevVs(i), curVs(i))

    /** One full rebuild at `margin`: refreeze edges keyed by the view
      * version the publish creates, then publish the full binned tree. */
    def rebuild(margin: Double): Int = {
      val full = slice(newFrames).localCheckpoint(true)
      val ed = QuantileJoinView.freezeEdges(full, valueCol, bins, margin)
        .localCheckpoint(true)
      require(ed.where(col("lo").isNull || col("w").isNull).isEmpty,
        s"cannot freeze multiway quantile edges at $viewRoot: the join " +
          s"tree has no non-null '$valueCol' values — refresh again once " +
          "the sources carry at least one binnable row")
      val nextV = SnapshotStore.currentVersion(viewRoot) + 1
      ed.coalesce(1).write.mode("overwrite")
        .parquet(QuantileJoinView.edgesDir(viewRoot, nextV))
      if (SnapshotStore.currentVersion(viewRoot) == 0) {
        recordSpec(viewRoot, spec)
        SnapshotStore.appendEpoch(
          QuantileJoinView.binned(full, ed, groupCols, valueCol, 1),
          viewRoot, stamp)
      } else
        SnapshotStore.compactWith(
          QuantileJoinView.binned(full, ed, groupCols, valueCol, 1),
          viewRoot, epochOverride = Some(stamp))
    }
    def currentMargin(): Double = {
      val ed = QuantileJoinView.edgesFor(spark, viewRoot)
      if (ed.columns.contains("margin"))
        ed.select("margin").head().getDouble(0)
      else DefaultMargin
    }

    val vNew = if (prevVs.forall(_ == 0)) {
      rebuild(DefaultMargin)
    } else if (rootsV.indices.forall(i => curVs(i) == prevVs(i) ||
        JoinView.churnOnly(rootsV(i), prevVs(i), curVs(i)))) {
      // THE TELESCOPING REFRESH, binned flavor: append-moved tables
      // contribute their positive delta term, churned tables their ±
      // legs restricted to the table's dirty key tuples — mixed gaps
      // fold uniformly because signed bin counts retract. Churn legs
      // fuse into ONE per-row-signed term build (churnUnionRows);
      // checkpoints are single-pass (escape probe + binning read them).
      val ed = QuantileJoinView.edgesFor(spark, viewRoot)
      // per-table term builds (each blocking on probe jobs and a
      // checkpoint) overlap (guide §2.6); leg order stays the input
      // order, so the published union is unchanged
      val built = Overlap.map(moved) { i =>
        if (appendMoved(i))
          (Seq((deltaTermRows(i).localCheckpoint(true), 1)),
            Seq.empty[DataFrame])
        else {
          val dirty = dirtyOf(i)
          churnUnionRows(i, dirty) match {
            case Some(rows) =>
              (Seq.empty[(DataFrame, Int)], Seq(rows.localCheckpoint(true)))
            case None => // schema evolved mid-gap: honest two-leg shape
              (Seq((churnLegRows(i, dirty, prevVs(i)), -1),
                (churnLegRows(i, dirty, curVs(i)).localCheckpoint(true), 1)),
                Seq.empty[DataFrame])
          }
        }
      }
      val legs = built.flatMap(_._1); val fusedLegs = built.flatMap(_._2)
      // only POSITIVE mass can escape the frozen envelope: plain legs
      // with sign +1, and the fused legs' new-version (+1) subset
      if (legs.exists { case (rows, sign) =>
            sign > 0 && QuantileJoinView.escapes(rows, ed, valueCol) } ||
          fusedLegs.exists(rows => QuantileJoinView.escapes(
            rows.where(col(SignCol) === 1L), ed, valueCol)))
        rebuild(math.min(currentMargin() * 2.0, MaxMargin))
      else {
        QuantileJoinView.dropOrphanEdges(viewRoot)
        val terms = (legs.map { case (rows, sign) =>
          QuantileJoinView.binned(rows, ed, groupCols, valueCol, sign)
        } ++ fusedLegs.map(rows =>
          QuantileJoinView.binnedBy(rows, ed, groupCols, valueCol,
            col(SignCol)))).reduce(_ unionByName _)
        SnapshotStore.appendEpoch(
          if (terms.isEmpty) terms.repartition(1) else terms,
          viewRoot, stamp)
      }
    } else {
      rebuild(DefaultMargin) // compaction / vacuumed baseline broke the diff
    }
    rootsV.indices.foreach(i =>
      SnapshotStore.recordViewBaseline(rootsV(i), viewRoot, curVs(i)))
    vNew
  }

  /** Quantile estimates per group: groups…, `phi`, `est` — the storage
    * contract is the two-table view's verbatim, so serving DELEGATES
    * (one estimator, every flavor hash-matches the same replay). */
  def quantiles(spark: SparkSession, viewRoot: String,
                phis: Seq[Double]): DataFrame =
    QuantileJoinView.quantiles(spark, viewRoot, phis)

  /** The newest frozen edges at or below the view's current version. */
  def edgesFor(spark: SparkSession, viewRoot: String): DataFrame =
    QuantileJoinView.edgesFor(spark, viewRoot)

  /** DELTA-COMPENSATED estimates from a STALE view — sound over CHURN
    * gaps too (signed counts retract): stored counts merged with the
    * gap's telescoped signed terms folded on the fly under the SAME
    * frozen edges, bit-equal to refresh-then-serve. Declines (None) when
    * compensation would change the freeze (a positive gap leg ESCAPES —
    * refresh would refreeze and re-bin), when a gap commit compacted a
    * source or the baseline vacuumed, or on spec mismatch. */
  def compensatedQuantiles(spark: SparkSession, roots: Seq[String],
                           viewRoot: String, edges: Seq[Edge],
                           groupCols: Seq[String], valueCol: String,
                           phis: Seq[Double],
                           bins: Int = DefaultBins): Option[DataFrame] = {
    val n = roots.size
    val prevVs = MultiAggJoinView.cursors(viewRoot, n).toIndexedSeq
    if (prevVs.forall(_ == 0)) return None
    val curVs = roots.map(SnapshotStore.currentVersion).toIndexedSeq
    if (curVs.zip(prevVs).exists { case (cv, pv) => cv < pv }) return None
    if (curVs == prevVs) return Some(quantiles(spark, viewRoot, phis))
    if (!recordedSpec(viewRoot).contains(
        specLine(n, edges, groupCols, valueCol, bins))) return None
    val rootsV = roots.toIndexedSeq
    if (!rootsV.indices.forall(i => curVs(i) == prevVs(i) ||
        JoinView.churnOnly(rootsV(i), prevVs(i), curVs(i)))) return None
    val ed = QuantileJoinView.edgesFor(spark, viewRoot).localCheckpoint(true)
    val newFrames = rootsV.zip(curVs)
      .map { case (r, v) => SnapshotStore.readEvolved(spark, r, v) }
    val adj = MultiAggJoinView.adjacency(n, edges)
    def slice(frames: IndexedSeq[DataFrame]): DataFrame =
      MultiAggJoinView.joinedSlice(frames, edges, groupCols, Seq(valueCol))
    def versFor(i: Int): IndexedSeq[Int] =
      rootsV.indices.map(j => if (j < i) curVs(j) else prevVs(j)).toIndexedSeq
    def restrictionKeys(i: Int): Seq[String] =
      if (i == 0) edges.head.parentKeys else edges(i - 1).childKeys
    val moved = rootsV.indices.filter(i => curVs(i) > prevVs(i))
    // churn legs fuse into ONE per-row-signed term build per table —
    // the refresh's churnUnionRows shape (see there for the exactness
    // argument); schema-evolved gaps fall back to the two-leg shape
    val built = Overlap.map(moved) { i =>
      if (JoinView.appendOnly(rootsV(i), prevVs(i), curVs(i))) {
        val delta = SnapshotStore.incremental(spark, rootsV(i),
          prevVs(i), curVs(i), Some(newFrames(i).schema))
        (Seq((slice(MultiAggJoinView.termFrames(spark, rootsV, n, adj,
          i, delta, versFor(i))).localCheckpoint(true), 1)),
          Seq.empty[DataFrame])
      } else {
        val myKeys = restrictionKeys(i)
        val dirty = JoinView.keyTuples(
          SnapshotStore.changes(spark, rootsV(i), prevVs(i), curVs(i))
            .select(myKeys.map(col): _*), myKeys)
        def restricted(ver: Int): DataFrame = JoinView.prefiltered(
          JoinView.standing(spark, rootsV(i), ver, myKeys, dirty),
          myKeys, dirty)
        def leg(ver: Int): DataFrame =
          slice(MultiAggJoinView.termFrames(spark, rootsV, n, adj, i,
            restricted(ver), versFor(i)))
        val old = restricted(prevVs(i)); val nw = restricted(curVs(i))
        if (old.columns.toSeq != nw.columns.toSeq)
          (Seq((leg(prevVs(i)), -1),
            (leg(curVs(i)).localCheckpoint(true), 1)), Seq.empty[DataFrame])
        else (Seq.empty[(DataFrame, Int)], Seq(MultiAggJoinView.joinedSlice(
          MultiAggJoinView.termFrames(spark, rootsV, n, adj, i,
            old.withColumn(SignCol, lit(-1L))
              .unionByName(nw.withColumn(SignCol, lit(1L))),
            versFor(i)),
          edges, groupCols, Seq(valueCol, SignCol)).localCheckpoint(true)))
      }
    }
    val legs = built.flatMap(_._1); val fusedLegs = built.flatMap(_._2)
    if (legs.exists { case (rows, sign) =>
          sign > 0 && QuantileJoinView.escapes(rows, ed, valueCol) } ||
        fusedLegs.exists(rows => QuantileJoinView.escapes(
          rows.where(col(SignCol) === 1L), ed, valueCol)))
      return None
    val deltaCounts = (legs.map { case (rows, sign) =>
      QuantileJoinView.binned(rows, ed, groupCols, valueCol, sign)
    } ++ fusedLegs.map(rows =>
      QuantileJoinView.binnedBy(rows, ed, groupCols, valueCol,
        col(SignCol)))).reduce(_ unionByName _)
    val counts = SnapshotStore.read(spark, viewRoot)
      .unionByName(deltaCounts)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .where(col("cnt") > 0)
    Some(QuantileJoinView.estimatesFrom(counts, ed, groupCols, phis))
  }

  /** Fold signed partials to one live row per (group, bin); content and
    * cursor unchanged (the shared storage contract). */
  def compact(spark: SparkSession, viewRoot: String): Int =
    QuantileJoinView.compact(spark, viewRoot)
}
