package graft.plans

import java.nio.file.Paths

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.{JoinView, SnapshotStore}

/** Registry of (left store, right store, key pair) → maintained
  * [[JoinView]] the [[JoinRewriteRule]] may answer from. Explicit opt-in
  * like [[MaterializedRollups]] — the engine never guesses which parquet
  * relations are maintained views. */
object MaterializedJoins {

  // key: (canonical left root, canonical right root, left key, right key,
  // join type "inner" | "left_outer" | "full_outer") — the type is PART
  // of the key: an inner and an outer view over the same pair coexist
  // (one put per type), instead of the second registration silently
  // evicting the first
  /** A registration's payload: the view plus everything the STALE
    * serving path needs to rebuild the compensation (original-case
    * roots and key lists — the registry key only carries the
    * lowercased sorted signature). */
  private[plans] final case class JReg(viewRoot: String,
                                       leftRoot: String, rightRoot: String,
                                       leftKeys: Seq[String],
                                       rightKeys: Seq[String],
                                       serveStale: Boolean)

  private val regs =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, String, String), JReg]()

  // path canonicalization, mtime probing, and version-pinning shared
  // with MaterializedRollups — ONE definition of each invariant
  private def canon(p: String): String = MaterializedRollups.canon(p)

  /** Canonical form of a key-pair list: pairs sorted by left key name —
    * a conjunction's equalities carry no order, so both the registration
    * and the matched condition normalize the same way. */
  private[plans] def keySig(lks: Seq[String], rks: Seq[String]): (String, String) = {
    val pairs = lks.map(_.toLowerCase).zip(rks.map(_.toLowerCase)).sortBy(_._1)
    (pairs.map(_._1).mkString(","), pairs.map(_._2).mkString(","))
  }

  /** Declare `viewRoot` as [[JoinView]]-maintained over the two stores on
    * (leftKey = rightKey). From now on a user-shaped equi-join of the two
    * sources' CURRENT snapshots on that key pair — INNER for an inner
    * view, LEFT OUTER for a `how = "left_outer"` view — is answered from
    * the view, when, and only when, the view's packed cursor matches
    * both sources' current versions at planning time (the same
    * analysis-time binding contract as [[MaterializedRollups.enable]]). */
  def enable(leftRoot: String, rightRoot: String, viewRoot: String,
             leftKey: String, rightKey: String,
             how: String = "inner", serveStale: Boolean = false): Unit =
    enableKeys(leftRoot, rightRoot, viewRoot, Seq(leftKey), Seq(rightKey),
      how, serveStale)

  /** [[enable]] for COMPOSITE equi-keys (pairwise positional equalities —
    * the [[JoinView.refreshKeys]] contract).
    *
    * `serveStale = true` additionally opts this registration into
    * DELTA-COMPENSATED serving: when the view's cursor lags the sources
    * but every gap commit is an append, an INNER-view query is answered
    * as `view ∪ Δ-joins` ([[JoinView.compensated]]) instead of
    * declining — fresh answers at O(view + Δ) between refreshes. A
    * churned or compacted gap still declines (compensation would be
    * unsound), as do outer shapes (conversion, not union). */
  def enableKeys(leftRoot: String, rightRoot: String, viewRoot: String,
                 leftKeys: Seq[String], rightKeys: Seq[String],
                 how: String = "inner", serveStale: Boolean = false): Unit = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key lists must be non-empty and pair up: $leftKeys vs $rightKeys")
    // registration-side sugar mirroring the rule's plan-side
    // normalization: a right-outer registration IS a left-outer one with
    // the sides swapped (JoinView maintains no right_outer views)
    if (how == "right_outer")
      return enableKeys(rightRoot, leftRoot, viewRoot,
        rightKeys, leftKeys, "left_outer", serveStale)
    require(how == "inner" || how == "left_outer" || how == "full_outer",
      s"registrable join types are inner, left_outer, full_outer, got '$how'")
    val (lk, rk) = keySig(leftKeys, rightKeys)
    regs.put((canon(leftRoot), canon(rightRoot), lk, rk, how),
      JReg(viewRoot, leftRoot, rightRoot, leftKeys, rightKeys, serveStale))
  }

  /** Unregister every pair mentioning `root` on either side (and evict
    * probe cache entries — registry queries use never-reused temp roots). */
  def disable(root: String): Unit = {
    val c = canon(root)
    regs.keySet().asScala.filter(k => k._1 == c || k._2 == c)
      .toSeq.foreach(regs.remove)
    probeCache.keySet().asScala.filter(_.contains(c + "|")).toSeq
      .foreach(probeCache.remove)
  }

  /** Unregister exactly the registrations SERVING from `viewRoot` —
    * sibling views sharing a source keep serving (the DDL DROP path). */
  def disableView(viewRoot: String): Unit = {
    val c = canon(viewRoot)
    regs.entrySet().asScala.filter(e => canon(e.getValue.viewRoot) == c)
      .map(_.getKey).toSeq.foreach(regs.remove)
    probeCache.keySet().asScala.filter(_.endsWith("|" + viewRoot)).toSeq
      .foreach(probeCache.remove)
  }

  def clear(): Unit = { regs.clear(); probeCache.clear() }

  private[plans] def isEmpty: Boolean = regs.isEmpty

  private[plans] def all: Map[(String, String, String, String, String), JReg] =
    regs.asScala.toMap

  // Freshness-probe cache, the MaterializedRollups posture for THREE
  // stores: all state publishes write a `_manifests` file, so the three
  // directories' nanosecond mtimes plus a hasManifest(v)/(v+1) pair per
  // store are a sound invalidation key; the hit path is stats and
  // existence checks, never a listing or manifest read.
  private final case class JProbe(lM: Long, rM: Long, vM: Long,
                                  lV: Int, rV: Int, vV: Int,
                                  lDirs: Set[String], rDirs: Set[String],
                                  fresh: Boolean)

  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[String, JProbe]()

  private def mtime(root: String): Long =
    MaterializedRollups.manifestDirMtime(root)

  private def unmoved(root: String, v: Int): Boolean =
    MaterializedRollups.storeUnmoved(root, v)

  /** Both sources' current-snapshot dirs + view freshness, cached until
    * any of the three stores' manifest directories change. */
  private[plans] def probe(leftRoot: String, rightRoot: String,
                           viewRoot: String): Option[(Set[String], Set[String], Boolean)] = {
    val key = s"$leftRoot|$rightRoot|$viewRoot"
    val (lM, rM, vM) = (mtime(leftRoot), mtime(rightRoot), mtime(viewRoot))
    if (lM < 0 || rM < 0) return None
    val cached = probeCache.get(key)
    if (cached != null && cached.lM == lM && cached.rM == rM && cached.vM == vM &&
        unmoved(leftRoot, cached.lV) && unmoved(rightRoot, cached.rV) &&
        unmoved(viewRoot, cached.vV))
      return Some((cached.lDirs, cached.rDirs, cached.fresh))
    val lV = SnapshotStore.currentVersion(leftRoot)
    val rV = SnapshotStore.currentVersion(rightRoot)
    if (lV == 0 || rV == 0) return None
    val vV = SnapshotStore.currentVersion(viewRoot)
    val fresh = SnapshotStore.lastEpoch(viewRoot)
      .contains(JoinView.packedCursor(lV, rV))
    val next = JProbe(lM, rM, vM, lV, rV, vV,
      SnapshotStore.manifestDirs(leftRoot, lV).map(canon).toSet,
      SnapshotStore.manifestDirs(rightRoot, rV).map(canon).toSet, fresh)
    probeCache.put(key, next)
    Some((next.lDirs, next.rDirs, next.fresh))
  }

  private[plans] def canonPaths(rel: LogicalRelation): Option[Set[String]] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(p => canon(p.toString)).toSet)
      case _ => None
    }
}

/** Materialized JOIN-view rewrite — transparent denormalization serving:
  * a user-shaped equi-join of two REGISTERED stores' current snapshots
  * on the registered key pair — INNER over an inner view, LEFT OUTER
  * over a left-outer view, FULL OUTER over a full-outer view, and a
  * RIGHT OUTER join normalized onto the left-outer view with the sides
  * swapped — is answered from the maintained [[JoinView]] instead of
  * re-running the join. At 100 TB this turns every fact-to-fact
  * navigation query from a two-sided shuffle join into a scan of rows
  * the refresh already paid for.
  *
  * Fires only when EXACT:
  *   - both scanned relations' root paths are precisely the registered
  *     stores' current-version manifest dirs (time travel / incremental
  *     reads never rewrite), with at most column-pruning Projects and
  *     deterministic row Filters between scan and join — an inner join
  *     commutes with per-side filters (σ_p(L) ⋈ R = σ_p(L ⋈ R) when p
  *     reads only L's columns), so side filters re-apply to view rows.
  *     A LEFT OUTER join commutes only with LEFT-side filters (each
  *     left row's fate is independent); a right-side filter changes
  *     which left rows null-extend, so it DECLINES;
  *   - the view is FRESH: its packed cursor equals BOTH sources' current
  *     versions at planning time (analysis-time binding, as documented
  *     on [[MaterializedJoins.enable]]);
  *   - the join condition is a pure conjunction of attribute equalities
  *     whose pair SET equals the registered key pairs (any conjunct
  *     order, either operand order; either join ORIENTATION for inner —
  *     a left-outer join is asymmetric, so only the registered
  *     orientation serves). A subset, superset, or any other shape
  *     declines.
  *
  * Output attributes keep the original exprIds. Inner views drop right
  * key columns, so each right key is served from its PAIRED left key's
  * view column — value-equal by the inner-join equality itself; outer
  * views KEEP their right keys (null = unmatched, exactly the user
  * join's output), so every column resolves by name directly. By-name
  * resolution is safe because JoinView's bootstrap refuses colliding
  * names. */
class JoinRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MaterializedJoins.isEmpty) return plan
    plan.transformUp {
      case j @ Join(lchild, rchild, Inner, Some(cond), _) =>
        rewrite(j, lchild, rchild, cond, Inner).getOrElse(j)
      case j @ Join(lchild, rchild, LeftOuter, Some(cond), _) =>
        rewrite(j, lchild, rchild, cond, LeftOuter).getOrElse(j)
      // A RIGHT OUTER join IS a left-outer join with the sides swapped —
      // normalize onto the left-outer view (pure plan sugar, no new
      // maintenance): the swapped call makes the preserved side the
      // view's left side, so the filter-commute rule lands on the right
      // rows automatically and output attrs still resolve by name
      case j @ Join(lchild, rchild, RightOuter, Some(cond), _) =>
        rewrite(j, rchild, lchild, cond, LeftOuter).getOrElse(j)
      case j @ Join(lchild, rchild, FullOuter, Some(cond), _) =>
        rewrite(j, lchild, rchild, cond, FullOuter).getOrElse(j)
    }
  }

  /** Scan relation + any deterministic Filters between it and the join,
    * through column-pruning Projects (plain attributes only). */
  private def dissect(plan: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    plan match {
      case lr: LogicalRelation => Some((lr, Nil))
      case SubqueryAlias(_, child) => dissect(child) // temp-view name
      case v: View => dissect(v.child) // temp-view body wrapper
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        dissect(child)
      case Filter(cond, child) if cond.deterministic =>
        dissect(child).map { case (lr, fs) => (lr, cond +: fs) }
      case _ => None
    }

  /** Flatten a conjunction. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  private def rewrite(j: Join, lchild: LogicalPlan, rchild: LogicalPlan,
                      cond: Expression,
                      joinType: JoinType): Option[LogicalPlan] = {
    // the condition must be a pure conjunction of attr = attr equalities,
    // each orientable to (left side, right side)
    val pairs = conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (lchild.outputSet.contains(a) && rchild.outputSet.contains(b)) (a, b)
        else if (lchild.outputSet.contains(b) && rchild.outputSet.contains(a)) (b, a)
        else return None
      case _ => return None
    }
    val (las, ras) = pairs.unzip
    val (lrel, lfilters) = dissect(lchild).getOrElse(return None)
    val (rrel, rfilters) = dissect(rchild).getOrElse(return None)
    // a left-outer join does NOT commute with right-side filters: a left
    // row matched only to filtered-out right rows null-extends in the
    // user's query, but the view materialized it matched. A FULL outer
    // join commutes with NEITHER side's filters (each side's filter
    // changes which rows of the OTHER side null-extend)
    if (joinType == LeftOuter && rfilters.nonEmpty) return None
    if (joinType == FullOuter && (lfilters.nonEmpty || rfilters.nonEmpty))
      return None
    val lpaths = MaterializedJoins.canonPaths(lrel).getOrElse(return None)
    val rpaths = MaterializedJoins.canonPaths(rrel).getOrElse(return None)
    val sig = MaterializedJoins.keySig(las.map(_.name), ras.map(_.name))
    val flipped = MaterializedJoins.keySig(ras.map(_.name), las.map(_.name))
    val wantHow = joinType match {
      case LeftOuter => "left_outer"
      case FullOuter => "full_outer"
      case _         => "inner"
    }
    // inner and full-outer joins are symmetric: match the registration in
    // either side order (the user may write R.join(L) for a view
    // registered (L, R)); a left-outer join serves ONLY in the registered
    // orientation (its right-outer spelling is normalized by the caller)
    val symmetric = joinType == Inner || joinType == FullOuter
    // ONE probe call per registration: dirs-match and freshness must come
    // from the SAME atomic probe result — a concurrent refresh between
    // two probe calls could pair version-N dirs with version-N+1
    // freshness and serve content newer than the query's pinned snapshot
    val candidates = MaterializedJoins.all.iterator.flatMap {
      case ((lr, rr, lk, rk, how), r) if how == wantHow &&
          ((lk, rk) == sig || (symmetric && (lk, rk) == flipped)) =>
        MaterializedJoins.probe(lr, rr, r.viewRoot).flatMap {
          case (ld, rd, fresh) =>
            if ((lk, rk) == sig && ld == lpaths && rd == rpaths)
              Some((r, fresh))
            else if (symmetric && (lk, rk) == flipped &&
                ld == rpaths && rd == lpaths)
              Some((r, fresh))
            else None
        }
      case _ => None
    }.toSeq
    // prefer a FRESH hit over a stale one (two registrations can match
    // the same query in opposite orientations — a stale non-opted first
    // hit must not shadow a fresh second)
    val (reg, fresh) = candidates.find(_._2)
      .orElse(candidates.headOption).getOrElse(return None)

    // FRESH: serve the stored view. STALE + opted-in: serve the
    // delta-compensated union when [[JoinView.compensated]] deems it
    // sound — inner views over append-only gaps on either side,
    // left-outer views over a LEFT-side-only append gap (each leg keeps
    // the view's own shape). Anything else declines inside compensated
    // (today's answer off the base join stays correct).
    val baseDf =
      if (fresh) JoinView.read(spark, reg.viewRoot)
      else if (reg.serveStale)
        JoinView.compensated(spark, reg.leftRoot, reg.rightRoot,
          reg.viewRoot, reg.leftKeys, reg.rightKeys).getOrElse(return None)
      else return None
    val viewPlan = baseDf.queryExecution.analyzed
    val byName = viewPlan.output.map(a => a.name.toLowerCase -> a).toMap
    // INNER views dropped their right keys; each inner equality makes the
    // two key columns value-identical, so whichever key name the view
    // lacks is served from its PAIRED key's column (covers both join
    // orientations). OUTER views keep both key sets — and the pairing is
    // NOT value-sound there (an unmatched row's right key is null while
    // its left key isn't), so resolution is by name only.
    val pairedName: Map[String, String] =
      if (joinType != Inner) Map.empty
      else (las.map(_.name.toLowerCase).zip(ras.map(_.name.toLowerCase)) ++
        ras.map(_.name.toLowerCase).zip(las.map(_.name.toLowerCase))).toMap
    def resolve(name: String): Option[Attribute] =
      byName.get(name.toLowerCase)
        .orElse(pairedName.get(name.toLowerCase).flatMap(byName.get))

    val projections = j.output.map { attr =>
      resolve(attr.name) match {
        case Some(vc) if vc.dataType == attr.dataType =>
          Alias(vc, attr.name)(exprId = attr.exprId)
        case _ => return None
      }
    }
    var mappable = true
    val mapped = (lfilters ++ rfilters).map(_.transform {
      case a: AttributeReference =>
        resolve(a.name) match {
          case Some(vc) if vc.dataType == a.dataType => vc
          case _ => mappable = false; a
        }
    })
    if (!mappable) return None
    val base =
      if (mapped.isEmpty) viewPlan
      else Filter(mapped.reduce(And), viewPlan)
    Some(Project(projections, base))
  }
}
