package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, HllSketchAgg, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.DecimalType

import graft.sources.AggJoinView

/** Registry of (left store, right store, key pairs, group columns,
  * measure columns) → maintained [[AggJoinView]] the
  * [[AggJoinRewriteRule]] may answer from. Explicit opt-in like the
  * sibling registries — the engine never guesses which parquet
  * relations are maintained views. */
object MaterializedAggJoins {

  // key: (canon left root, canon right root, left key sig, right key
  // sig, sorted group cols, sorted measure cols) — the full view spec,
  // so differently-shaped MVs over the same join coexist
  /** A registration's payload: the view plus everything the STALE
    * serving path needs to rebuild the compensation (original-case
    * roots, key lists, and spec columns). */
  /** `kind`: "classic" (count/sum/avg/min/max partials) or "ndv" (HLL
    * sketch of `measureCols.head` — the [[graft.sources.NdvJoinView]]
    * store, serving the `hll_sketch_estimate(hll_sketch_agg(x, lgK))`
    * shape). */
  private[plans] final case class AReg(viewRoot: String,
                                       leftRoot: String, rightRoot: String,
                                       leftKeys: Seq[String],
                                       rightKeys: Seq[String],
                                       groupCols: Seq[String],
                                       measureCols: Seq[String],
                                       serveStale: Boolean,
                                       kind: String = "classic")

  private val regs = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String, String, String, String, String), AReg]()

  private def canon(p: String): String = MaterializedRollups.canon(p)

  private def lcSorted(xs: Seq[String]): String =
    xs.map(_.toLowerCase(java.util.Locale.ROOT)).sorted.mkString(",")

  /** Declare `viewRoot` as [[AggJoinView]]-maintained over the two
    * stores. From now on a user-shaped
    * `L JOIN R ON keys GROUP BY groupCols` aggregate of count(1) /
    * decimal sums of the registered measures over the sources' CURRENT
    * snapshots is answered from the view — when, and only when, the
    * view's packed cursor matches both sources' current versions at
    * planning time (the [[MaterializedJoins]] binding contract). */
  /** `serveStale = true` additionally opts this registration into
    * DELTA-COMPENSATED serving: when the view's cursor lags the sources
    * but every gap commit is an append, the aggregate is answered as
    * stored partials merged with the gap's delta-join rows folded on
    * the fly ([[AggJoinView.compensatedRead]]) instead of declining. A
    * churned gap still declines. */
  def enableKeys(leftRoot: String, rightRoot: String, viewRoot: String,
                 leftKeys: Seq[String], rightKeys: Seq[String],
                 groupCols: Seq[String], measureCols: Seq[String],
                 serveStale: Boolean = false): Unit =
    put(leftRoot, rightRoot, viewRoot, leftKeys, rightKeys, groupCols,
      measureCols, serveStale, "classic")

  /** Declare `viewRoot` as [[graft.sources.NdvJoinView]]-maintained:
    * the user-shaped `L JOIN R GROUP BY g` distinct-count aggregate —
    * `hll_sketch_estimate(hll_sketch_agg(x, lgK))` at the engine's lgK —
    * over the sources' current snapshots is answered from the stored
    * sketches (register-max union keeps the merged estimate bit-equal to
    * the single-pass aggregate). `serveStale` opts append-only gaps into
    * the compensated sketch union; churned gaps decline (a monotone
    * sketch cannot retract). */
  def enableNdvKeys(leftRoot: String, rightRoot: String, viewRoot: String,
                    leftKeys: Seq[String], rightKeys: Seq[String],
                    groupCols: Seq[String], distinctCol: String,
                    serveStale: Boolean = false): Unit =
    put(leftRoot, rightRoot, viewRoot, leftKeys, rightKeys, groupCols,
      Seq(distinctCol), serveStale, "ndv")

  def enableNdv(leftRoot: String, rightRoot: String, viewRoot: String,
                leftKey: String, rightKey: String,
                groupCols: Seq[String], distinctCol: String,
                serveStale: Boolean = false): Unit =
    enableNdvKeys(leftRoot, rightRoot, viewRoot, Seq(leftKey), Seq(rightKey),
      groupCols, distinctCol, serveStale)

  private def put(leftRoot: String, rightRoot: String, viewRoot: String,
                  leftKeys: Seq[String], rightKeys: Seq[String],
                  groupCols: Seq[String], measureCols: Seq[String],
                  serveStale: Boolean, kind: String): Unit = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key lists must be non-empty and pair up: $leftKeys vs $rightKeys")
    val (lk, rk) = MaterializedJoins.keySig(leftKeys, rightKeys)
    regs.put((canon(leftRoot), canon(rightRoot), lk, rk,
      lcSorted(groupCols), lcSorted(measureCols), kind),
      AReg(viewRoot, leftRoot, rightRoot, leftKeys, rightKeys,
        groupCols, measureCols, serveStale, kind))
  }

  def enable(leftRoot: String, rightRoot: String, viewRoot: String,
             leftKey: String, rightKey: String,
             groupCols: Seq[String], measureCols: Seq[String],
             serveStale: Boolean = false): Unit =
    enableKeys(leftRoot, rightRoot, viewRoot, Seq(leftKey), Seq(rightKey),
      groupCols, measureCols, serveStale)

  /** Unregister every registration mentioning `root` on either side. */
  def disable(root: String): Unit = {
    val c = canon(root)
    regs.keySet().asScala.filter(k => k._1 == c || k._2 == c)
      .toSeq.foreach(regs.remove)
  }

  /** Unregister exactly the registrations SERVING from `viewRoot` —
    * sibling views over the same join (the ndv twin, a differently
    * grouped MV) keep serving (the DDL DROP path). */
  def disableView(viewRoot: String): Unit = {
    val c = canon(viewRoot)
    regs.entrySet().asScala.filter(e => canon(e.getValue.viewRoot) == c)
      .map(_.getKey).toSeq.foreach(regs.remove)
  }

  def clear(): Unit = regs.clear()

  private[plans] def isEmpty: Boolean = regs.isEmpty

  private[plans] def all: Map[(String, String, String, String, String, String, String), AReg] =
    regs.asScala.toMap
}

/** Materialized AGGREGATE-OVER-JOIN rewrite — the star-schema MV as one
  * Catalyst rule: a user-shaped
  *
  * {{{ L.join(R, lk === rk).groupBy(g…).agg(count(1), sum(m.cast(decimal(≤30,2)))) }}}
  *
  * over two REGISTERED stores' current snapshots is answered from the
  * O(groups) maintained [[AggJoinView]] instead of re-running the join
  * AND the aggregation. At 100 TB this is the flagship warehouse
  * acceleration: the fact×dim shuffle join disappears from every
  * dashboard query, replaced by a scan of partial rows the refresh
  * already paid for.
  *
  * Fires only when EXACT (the sibling rules' posture):
  *   - both scanned relations' root paths are precisely the registered
  *     stores' current-version manifest dirs, with at most
  *     column-pruning Projects and deterministic Filters between scan,
  *     join, and aggregate — and every filter references ONLY grouping
  *     columns (then filtering source rows, join rows, and view groups
  *     are the same set; any other filter declines: the view covers
  *     whole groups, not row slices);
  *   - the view is FRESH: its packed cursor equals both sources'
  *     current versions at planning time;
  *   - the join is INNER on exactly the registered key-pair set (either
  *     side order — inner is symmetric);
  *   - grouping expressions are plain attributes whose name set, after
  *     normalizing a grouped-on right key onto its paired left key (the
  *     inner equality makes them value-identical), equals the
  *     registered group columns exactly;
  *   - every aggregate is `count(1)` (→ `cnt`),
  *     `sum(CAST(measure AS DECIMAL(p≤30, 2)))` (→ the view's exact
  *     decimal partial — casting to scale 2 at any precision ≥ the
  *     values' magnitude rounds identically, so the stored DECIMAL(30,2)
  *     partial reproduces the user's sum bit-exactly), or
  *     `avg(CAST(measure AS DECIMAL(p≤30, 2)))` (→ stored sum ÷ the
  *     stored non-null count `nn_<measure>` — Average's own divisor —
  *     with its decimal arithmetic replicated operand-type-for-
  *     operand-type, bit-equal to the base plan), or `min/max(measure)`
  *     when the view is maintained with EXTENTS (the stored min_/max_
  *     column must exist at the measure's own dataType; a count/sum-only
  *     view lacks it and declines). Anything else — distinct, a raw
  *     double sum or avg — declines rather than approximates.
  *
  * Output attributes keep the original exprIds. Registered BEFORE
  * [[JoinRewriteRule]] in [[graft.GraftExtensions]]: both match the
  * same Join, and serving the aggregate from O(groups) partials beats
  * serving the join view and re-aggregating O(join rows). */
class AggJoinRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MaterializedAggJoins.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(ge, ae, child, _) =>
        rewrite(agg, ge, ae, child).getOrElse(agg)
    }
  }

  /** Peel Projects/Filters between the aggregate and the join. */
  private def dissectToJoin(plan: LogicalPlan): Option[(Join, Seq[Expression])] =
    plan match {
      case j: Join => Some((j, Nil))
      case SubqueryAlias(_, child) => dissectToJoin(child) // temp-view name
      case v: View => dissectToJoin(v.child) // temp-view body wrapper
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        dissectToJoin(child)
      case Filter(cond, child) if cond.deterministic =>
        dissectToJoin(child).map { case (j, fs) => (j, cond +: fs) }
      case _ => None
    }

  /** Scan relation + Filters between it and the join (the
    * [[JoinRewriteRule]] dissect). */
  private def dissectSide(plan: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    plan match {
      case lr: LogicalRelation => Some((lr, Nil))
      case SubqueryAlias(_, child) => dissectSide(child) // temp-view name
      case v: View => dissectSide(v.child) // temp-view body wrapper
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        dissectSide(child)
      case Filter(cond, child) if cond.deterministic =>
        dissectSide(child).map { case (lr, fs) => (lr, cond +: fs) }
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  private def rewrite(agg: Aggregate, ge: Seq[Expression],
                      ae: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    val (j, topFilters) = dissectToJoin(child).getOrElse(return None)
    val (lchild, rchild, cond) = j match {
      case Join(l, r, Inner, Some(c), _) => (l, r, c)
      case _                             => return None
    }
    // condition: pure conjunction of attr = attr, each orientable
    val pairs = conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (lchild.outputSet.contains(a) && rchild.outputSet.contains(b)) (a, b)
        else if (lchild.outputSet.contains(b) && rchild.outputSet.contains(a)) (b, a)
        else return None
      case _ => return None
    }
    val (las, ras) = pairs.unzip
    val (lrel, lfilters) = dissectSide(lchild).getOrElse(return None)
    val (rrel, rfilters) = dissectSide(rchild).getOrElse(return None)
    val lpaths = MaterializedJoins.canonPaths(lrel).getOrElse(return None)
    val rpaths = MaterializedJoins.canonPaths(rrel).getOrElse(return None)
    // grouping: plain attributes only
    val groupAttrs = ge.map {
      case a: AttributeReference => a
      case _                     => return None
    }

    val sig = MaterializedJoins.keySig(las.map(_.name), ras.map(_.name))
    val flipped = MaterializedJoins.keySig(ras.map(_.name), las.map(_.name))

    // inner joins are symmetric: try the registration in either side
    // order. `keyPairs` is oriented registration-left → registration-
    // right so grouped-on registration-right keys normalize onto their
    // stored pair. ONE probe per candidate (dirs match + freshness from
    // the same atomic result — the sibling rules' TOCTOU posture); a
    // fresh hit is preferred over a stale one.
    case class Hit(reg: MaterializedAggJoins.AReg, groups: Set[String],
                   measures: Set[String], keyPairs: Seq[(String, String)],
                   fresh: Boolean, userLeftIsRegLeft: Boolean)
    val candidates = MaterializedAggJoins.all.iterator.flatMap {
      case ((lr, rr, lk, rk, g, m, _), r)
          if (lk, rk) == sig || (lk, rk) == flipped =>
        MaterializedJoins.probe(lr, rr, r.viewRoot).flatMap {
          case (ld, rd, fresh) =>
            if ((lk, rk) == sig && ld == lpaths && rd == rpaths)
              Some(Hit(r, g.split(",").toSet, splitSet(m),
                las.map(_.name.toLowerCase).zip(ras.map(_.name.toLowerCase)),
                fresh, userLeftIsRegLeft = true))
            else if ((lk, rk) == flipped && ld == rpaths && rd == lpaths)
              Some(Hit(r, g.split(",").toSet, splitSet(m),
                ras.map(_.name.toLowerCase).zip(las.map(_.name.toLowerCase)),
                fresh, userLeftIsRegLeft = false))
            else None
        }
      case _ => None
    }.toSeq
    // the aggregate list picks the view KIND it needs: any datasketches
    // distinct-count shape wants the ndv view, everything else classic —
    // then freshness breaks ties among same-kind candidates
    val wantsNdv = ae.exists {
      case Alias(HllSketchEstimate(_), _) => true
      case _                              => false
    }
    val kinded = candidates.filter(h =>
      (h.reg.kind == "ndv") == wantsNdv)
    // GROUPS participate in candidate SELECTION: registrations sharing
    // the join but grouped differently coexist in the registry, and the
    // query lands on the one its grouping attributes normalize onto
    // (a grouped-on right key serves from its paired left key's stored
    // column — value-identical under the inner equality)
    def groupNorm(h: Hit): Option[Map[ExprId, String]] = {
      val rkToLk = h.keyPairs.map(_.swap).toMap
      def normName(n: String): String = {
        val lc = n.toLowerCase
        if (h.groups.contains(lc)) lc
        else rkToLk.getOrElse(lc, lc)
      }
      val m = groupAttrs.map(a => a.exprId -> normName(a.name)).toMap
      if (m.values.toSet == h.groups) Some(m) else None
    }
    val matched = kinded.flatMap(h => groupNorm(h).map(h -> _))
    val (hit, normed) = matched.find(_._1.fresh)
      .orElse(matched.headOption).getOrElse(return None)
    val rkToLk = hit.keyPairs.map(_.swap).toMap

    // measure/distinct attributes resolve on their SIDE, not just by
    // name: the registered measure's OWNER side is where the stored
    // partial came from (the refresh resolution contract — exactly one
    // side, reg-right keys excluded), and a same-named column on the
    // OTHER side must not serve from the owner's partials. The one
    // cross-side spelling that IS sound: a reg-right KEY normalizes onto
    // its paired left key (value-identical under the inner equality).
    // Returns the stored-column name.
    val (regLeftRel, regRightRel) =
      if (hit.userLeftIsRegLeft) (lrel, rrel) else (rrel, lrel)
    val regRightKeys = hit.keyPairs.map(_._2).toSet
    def measureNorm(v: AttributeReference): Option[String] = {
      val onRegLeft = regLeftRel.outputSet.contains(v)
      val nm = v.name.toLowerCase
      val norm = if (onRegLeft) nm else rkToLk.getOrElse(nm, nm)
      if (!hit.measures.contains(norm)) None
      else {
        val lHas = regLeftRel.output.exists(_.name.equalsIgnoreCase(norm))
        val rHas = regRightRel.output.exists(_.name.equalsIgnoreCase(norm)) &&
          !regRightKeys.contains(norm)
        (lHas, rHas) match {
          case (true, false) =>
            if (onRegLeft || rkToLk.contains(nm)) Some(norm) else None
          case (false, true) => if (!onRegLeft) Some(norm) else None
          case _             => None // ambiguous or absent: decline
        }
      }
    }

    // every filter (above the join or on a side) must reference only
    // grouping attributes — then it re-applies to view groups verbatim
    val groupingSet = AttributeSet(groupAttrs)
    val allFilters = topFilters ++ lfilters ++ rfilters
    if (!allFilters.forall(_.references.subsetOf(groupingSet))) return None

    // FRESH: serve the stored partials. STALE + opted-in + append-only
    // gap: serve the delta-compensated merge. Anything else declines.
    val viewDf =
      if (hit.fresh) hit.reg.kind match {
        case "ndv" => graft.sources.NdvJoinView.read(spark, hit.reg.viewRoot)
        case _     => AggJoinView.read(spark, hit.reg.viewRoot)
      }
      else if (hit.reg.serveStale) {
        hit.reg.kind match {
          case "ndv" => graft.sources.NdvJoinView.compensatedRead(spark,
            hit.reg.leftRoot, hit.reg.rightRoot, hit.reg.viewRoot,
            hit.reg.leftKeys, hit.reg.rightKeys, hit.reg.groupCols,
            hit.reg.measureCols.head)
          case _ => AggJoinView.compensatedRead(spark, hit.reg.leftRoot,
            hit.reg.rightRoot, hit.reg.viewRoot, hit.reg.leftKeys,
            hit.reg.rightKeys, hit.reg.groupCols, hit.reg.measureCols)
        }
      }.getOrElse(return None)
      else return None
    val viewPlan = viewDf.queryExecution.analyzed
    def viewCol(n: String): Option[Attribute] =
      viewPlan.output.find(_.name.equalsIgnoreCase(n))

    def groupViewCol(a: AttributeReference): Option[Attribute] =
      normed.get(a.exprId).flatMap(viewCol)
        .filter(_.dataType == a.dataType)

    val projections = ae.map {
      case a: AttributeReference if normed.contains(a.exprId) =>
        Alias(groupViewCol(a).getOrElse(return None), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _) if normed.contains(a.exprId) =>
        Alias(groupViewCol(a).getOrElse(return None), al.name)(exprId = al.exprId)
      case al @ Alias(ag @ AggregateExpression(
          Count(Seq(Literal(1, _))), _, false, None, _), _) =>
        val c = viewCol("cnt").filter(_.dataType == ag.dataType)
          .getOrElse(return None)
        Alias(c, al.name)(exprId = al.exprId)
      // precision FLOOR 18 (the repo-wide decimal(18,2) convention): a
      // sub-magnitude cast like DECIMAL(4,2) overflows per-VALUE to null
      // in the base plan (non-ANSI cast) while the stored DECIMAL(30,2)
      // partial counted the value — the same query would answer
      // differently served vs declined. ≥ 18 keeps 16 integer digits,
      // far above the fixtures' value contract.
      case al @ Alias(ag @ AggregateExpression(
          Sum(Cast(v: AttributeReference, dt: DecimalType, _, _), _),
          _, false, None, _), _)
          if dt.scale == 2 && dt.precision <= 30 && dt.precision >= 18 &&
            measureNorm(v).isDefined =>
        val c = viewCol(s"sum_${measureNorm(v).get}").getOrElse(return None)
        Alias(Cast(c, ag.dataType), al.name)(exprId = al.exprId)
      // avg(CAST(measure AS DECIMAL(p,2))): served as stored-sum ÷ the
      // stored NON-NULL value count (`nn_<measure>` — Average divides by
      // the count of non-null inputs, NOT the row count; a group holding
      // a NULL measure would otherwise serve a silently wrong mean, e.g.
      // [2.00, NULL] → 1.00) with Average's OWN decimal arithmetic
      // replicated — operands cast to Average's internal types (sum at
      // DECIMAL(p+10,2), count at LongDecimal), so the Divide's result
      // precision/scale — and hence its HALF_UP rounding — are identical
      // to the base plan's, then the same final cast to Average.dataType.
      // Both inputs are exact (the decimal partial reproduces the user's
      // sum bit-exactly, nn IS Average's non-null count), so served ==
      // declined to the last digit (spec-pinned). nn CAN be 0 with
      // cnt > 0 (an all-NULL-measure group): the stored sum is NULL
      // there, and NULL ÷ 0 under LEGACY eval is NULL — exactly the base
      // plan's Average over zero non-null inputs. A pre-nn view (no
      // nn_<measure> column) declines rather than divide by the wrong
      // count.
      case al @ Alias(ag @ AggregateExpression(
          Average(Cast(v: AttributeReference, dt: DecimalType, _, _), _),
          _, false, None, _), _)
          if dt.scale == 2 && dt.precision <= 30 && dt.precision >= 18 &&
            measureNorm(v).isDefined =>
        val sumC = viewCol(s"sum_${measureNorm(v).get}").getOrElse(return None)
        val nnC = viewCol(s"nn_${measureNorm(v).get}").getOrElse(return None)
        val sumDt = DecimalType(math.min(dt.precision + 10, DecimalType.MAX_PRECISION), dt.scale)
        Alias(Cast(
          Divide(Cast(sumC, sumDt), Cast(nnC, DecimalType(20, 0)),
            EvalMode.LEGACY),
          ag.dataType), al.name)(exprId = al.exprId)
      // min/max serve only from an EXTENTS view (the stored min_/max_
      // column must exist with the measure's own dataType — a count/sum
      // view simply lacks it and declines here)
      case al @ Alias(ag @ AggregateExpression(
          Min(v: AttributeReference), _, false, None, _), _)
          if measureNorm(v).isDefined =>
        val c = viewCol(s"min_${measureNorm(v).get}")
          .filter(_.dataType == ag.dataType).getOrElse(return None)
        Alias(c, al.name)(exprId = al.exprId)
      case al @ Alias(ag @ AggregateExpression(
          Max(v: AttributeReference), _, false, None, _), _)
          if measureNorm(v).isDefined =>
        val c = viewCol(s"max_${measureNorm(v).get}")
          .filter(_.dataType == ag.dataType).getOrElse(return None)
        Alias(c, al.name)(exprId = al.exprId)
      // the datasketches distinct-count shape — served from an NDV-kind
      // view's merged-sketch estimate (register-max union makes it
      // bit-equal to the single-pass aggregate); the lgK must be the
      // engine's own (a different precision would change the estimate)
      case al @ Alias(HllSketchEstimate(AggregateExpression(
          HllSketchAgg(u: AttributeReference, lgk, _, _), _, false, None, _)), _)
          if hit.reg.kind == "ndv" && lgk.foldable &&
            lgk.eval() == graft.sources.NdvView.LgK &&
            measureNorm(u).isDefined =>
        val c = viewCol(s"approx_${measureNorm(u).get}")
          .filter(_.dataType == al.dataType).getOrElse(return None)
        Alias(c, al.name)(exprId = al.exprId)
      case _ => return None // any other shape: decline, never approximate
    }
    var mappable = true
    val mapped = allFilters.map(_.transform {
      case a: AttributeReference =>
        groupViewCol(a) match {
          case Some(vc) => vc
          case None     => mappable = false; a
        }
    })
    if (!mappable) return None
    val base =
      if (mapped.isEmpty) viewPlan
      else Filter(mapped.reduce(And), viewPlan)
    Some(Project(projections, base))
  }

  private def splitSet(s: String): Set[String] =
    if (s.isEmpty) Set.empty else s.split(",").toSet
}
