package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{MaterializedJoins, MaterializedRollups, PlanProbe}
import graft.sources.{JoinView, NdvView, QuantileView, RollupView, SnapshotStore}

/** Delta-compensated (stale-view) serving polarities: an append-only gap
  * serves `view ∪ Δ` with the view still in the plan; a churned gap, an
  * outer shape, or a registration that never opted in all DECLINE (and
  * stay correct off the base relations). */
class StaleServeSpec extends SparkSpec {

  private def withRoot(f: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("stale_spec").toString
    try f(root)
    finally {
      MaterializedJoins.disable(s"$root/L")
      MaterializedRollups.disable(s"$root/src")
      SnapshotStore.deleteTree(root)
    }
  }

  private def ordersDF(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"c${i % 4}", i * 1.0)).toDF("o_id", "cust", "total")
  }

  private def linesDF(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, i * 2.0)).toDF("lo_id", "qty")
  }

  private def userJoin(l: String, r: String): DataFrame = {
    val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
    lf.join(rf, lf("o_id") === rf("lo_id"))
  }

  private def rows(df: DataFrame): Set[(Long, Double)] =
    df.select(col("o_id"), col("qty")).collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSet

  test("join: append-only gap serves view ∪ Δ; values are CURRENT; churn gap declines") {
    withRoot { root =>
      val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/view"
      SnapshotStore.append(ordersDF(1L to 20L: _*), l)
      SnapshotStore.append(linesDF(1L to 15L: _*), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", serveStale = true)

      // append-only gap on BOTH sides, no refresh
      SnapshotStore.append(ordersDF(21L to 25L: _*), l)
      SnapshotStore.append(linesDF(16L to 23L: _*), r)
      val q = userJoin(l, r)
      assert(PlanProbe.scansAny(q, "/view"),
        "append-only stale gap must serve the compensated view")
      MaterializedJoins.disable(l)
      val want = rows(userJoin(l, r)) // ground truth off the sources
      assert(rows(q) == want && want.size == 23, "compensated values must be CURRENT")

      // a churned gap must decline: re-enable, delete a row, no refresh
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", serveStale = true)
      SnapshotStore.deleteWhere(spark, r, col("lo_id") === 3L)
      val churned = userJoin(l, r)
      assert(!PlanProbe.scansAny(churned, "/view"),
        "churned gap served stale — correctness bug")
      assert(rows(churned).size == 22) // declined path still correct

      // after a refresh the fresh path serves again
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(PlanProbe.scansOnly(userJoin(l, r), "/view"))
    }
  }

  test("join: without the opt-in a stale gap declines; an OUTER view never serves stale") {
    withRoot { root =>
      val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/view"
      SnapshotStore.append(ordersDF(1L to 10L: _*), l)
      SnapshotStore.append(linesDF(1L to 10L: _*), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id") // no opt-in
      SnapshotStore.append(linesDF(11L), r)
      assert(!PlanProbe.scansAny(userJoin(l, r), "/view"),
        "stale gap served without opt-in")

      // outer view: opted in, a RIGHT-side gap declines (a ΔR arrival
      // converts standing unmatched-left rows — conversion ≠ union)
      val vo = s"$root/view_o"
      JoinView.refresh(spark, l, r, vo, "o_id", "lo_id", "left_outer")
      MaterializedJoins.enable(l, r, vo, "o_id", "lo_id", "left_outer",
        serveStale = true)
      SnapshotStore.append(linesDF(12L), r)
      val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
      val oq = lf.join(rf, lf("o_id") === rf("lo_id"), "left_outer")
      assert(!PlanProbe.scansAny(oq, "/view"),
        "right-gap stale OUTER view served — conversion cannot be unioned")

      // ...but a LEFT-side-only append gap IS a union for ⟕: R unchanged
      // means no standing row's match status can move — serves compensated
      JoinView.refresh(spark, l, r, vo, "o_id", "lo_id", "left_outer")
      SnapshotStore.append(ordersDF(21L, 22L), l) // unmatched (R max = 12)
      def outerQ() = {
        val lf2 = SnapshotStore.read(spark, l)
        val rf2 = SnapshotStore.read(spark, r)
        lf2.join(rf2, lf2("o_id") === rf2("lo_id"), "left_outer")
      }
      val served = outerQ()
      assert(PlanProbe.scansAny(served, "/view"),
        "left-side-only append gap must serve the left-outer union")
      def orows(df: DataFrame) = df.select(col("o_id"), col("qty")).collect()
        .map(x => (x.getLong(0), Option(x.get(1)))).toSet
      val got = orows(served)
      MaterializedJoins.disable(l)
      assert(got == orows(outerQ()) && got.exists(_._2.isEmpty),
        "compensated left-outer must equal the current base, " +
          "null-extending the gap's unmatched rows")
    }
  }

  test("join: monotone-key compensation reads the view + delta-band files ONLY") {
    withRoot { root =>
      val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/view"
      SnapshotStore.appendWithStats(
        ordersDF(1L to 1000L: _*).repartitionByRange(col("o_id")),
        l, Seq("o_id"))
      SnapshotStore.appendWithStats(
        linesDF(1L to 1000L: _*).repartitionByRange(col("lo_id")),
        r, Seq("lo_id"))
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", serveStale = true)
      val lBoot = SnapshotStore.manifestDirs(l, 1).toSet
      val rBoot = SnapshotStore.manifestDirs(r, 1).toSet
      // monotone ingest: the gap's keys are strictly beyond the old max
      SnapshotStore.appendWithStats(ordersDF(2001L to 2050L: _*), l, Seq("o_id"))
      SnapshotStore.appendWithStats(linesDF(2001L to 2080L: _*), r, Seq("lo_id"))
      val q = userJoin(l, r)
      assert(PlanProbe.scansAny(q, "/view"))
      val scanned = PlanProbe.scanRoots(q).toSet
      val bootHits = scanned.filter(p =>
        (lBoot ++ rBoot).exists(b => p.startsWith(b) || b.startsWith(p)))
      assert(bootHits.isEmpty,
        s"compensation re-scanned standing bootstrap files: $bootHits")
      // and the answer is exact (50 new matched pairs + 1000 standing)
      MaterializedJoins.disable(l)
      assert(rows(q) == rows(userJoin(l, r)))
    }
  }

  test("join: a WIDENED append-only gap still serves compensated (null-fill contract)") {
    withRoot { root =>
      val s = spark
      import s.implicits._
      val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/view"
      SnapshotStore.append(ordersDF(1L to 10L: _*), l)
      SnapshotStore.append(linesDF(1L to 8L: _*), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", serveStale = true)
      // the gap WIDENS the right source (additive evolution, still an
      // append): the delta legs carry `note`, the view predates it —
      // pre-fix the compensation's strict unionByName crashed analysis
      SnapshotStore.append(
        Seq((9L, 18.0, "w9"), (10L, 20.0, "w10"))
          .toDF("lo_id", "qty", "note"), r)
      val q = userJoin(l, r)
      assert(PlanProbe.scansAny(q, "/view"),
        "widened append-only gap must still serve compensated")
      MaterializedJoins.disable(l)
      assert(rows(q) == rows(userJoin(l, r)),
        "compensated values must equal the current join under evolution")
    }
  }

  test("rollup: append-only gap serves partials ∪ Δ-partials; churn gap declines") {
    withRoot { root =>
      val src = s"$root/src"; val v = s"$root/view"
      SnapshotStore.append(
        seriesDF((1L to 40L).map(i => ("m" + i % 3, i * 3600, i * 1.0)): _*)
          .select("metric", "e", "value"), src)
      RollupView.refresh(spark, src, v)
      MaterializedRollups.enable(src, v, serveStale = true)
      def userAgg(): DataFrame =
        SnapshotStore.read(spark, src)
          .groupBy(col("metric"), expr("e div 86400").as("day"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).as("svd"),
            min(col("value")).as("mn"), max(col("value")).as("mx"))
          .select(col("metric"), col("day"), col("cnt"),
            col("svd").cast("double").as("sv"), col("mn"), col("mx"))
      assert(PlanProbe.scansOnly(userAgg(), "/view")) // fresh: plain serve

      SnapshotStore.append(
        seriesDF((41L to 60L).map(i => ("m" + i % 3, i * 3600, i * 1.0)): _*)
          .select("metric", "e", "value"), src)
      val stale = userAgg()
      assert(PlanProbe.scansAny(stale, "/view"),
        "append-only stale rollup gap must serve compensated")
      val got = stale.collect().map(x => (x.getString(0), x.getLong(1),
        x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))).toSet
      MaterializedRollups.disable(src)
      val want = userAgg().collect().map(x => (x.getString(0), x.getLong(1),
        x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))).toSet
      assert(got == want && want.nonEmpty)

      // churned gap declines
      MaterializedRollups.enable(src, v, serveStale = true)
      SnapshotStore.deleteWhere(spark, src, col("e") === 3600L)
      assert(!PlanProbe.scansAny(userAgg(), "/view"),
        "churned rollup gap served stale — retraction is not a union")
      // refresh restores plain serving
      RollupView.refresh(spark, src, v)
      assert(PlanProbe.scansOnly(userAgg(), "/view"))
    }
  }

  test("ndv: append-only gap serves sketch-union BIT-EQUAL to refresh-then-read; churn declines") {
    withRoot { root =>
      val s = spark
      import s.implicits._
      val src = s"$root/src"; val v = s"$root/nview"
      def mk(rows: Seq[(String, Long, String)]) =
        rows.toDF("metric", "e", "user_id")
      SnapshotStore.append(
        mk((1L to 40L).map(i => ("m" + i % 3, i * 3600, "u" + i % 7))), src)
      NdvView.refresh(spark, src, v)
      MaterializedRollups.enableNdv(src, v, serveStale = true)
      def userAgg(): DataFrame =
        SnapshotStore.read(spark, src)
          .groupBy(col("metric"), expr("e div 86400").as("day"))
          .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(user_id, " +
            s"${NdvView.LgK}))").as("au"))
      def got(df: DataFrame): Set[(String, Long, Long)] =
        df.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
      assert(PlanProbe.scansOnly(userAgg(), "/nview")) // fresh: plain serve

      // append-only gap (repeat AND new users), no refresh
      SnapshotStore.append(
        mk((41L to 60L).map(i => ("m" + i % 3, i * 3600, "u" + i % 11))), src)
      val stale = userAgg()
      assert(PlanProbe.scansAny(stale, "/nview"),
        "append-only stale ndv gap must serve the sketch union")
      val compensated = got(stale)
      MaterializedRollups.disable(src)
      // register-max union: compensated estimate == single-pass estimate
      assert(compensated == got(userAgg()) && compensated.nonEmpty,
        "compensated sketch union must be bit-equal to the single pass")

      // churned gap declines — a deleted user un-derives nothing
      MaterializedRollups.enableNdv(src, v, serveStale = true)
      SnapshotStore.deleteWhere(spark, src, col("e") === 3600L)
      assert(!PlanProbe.scansAny(userAgg(), "/nview"),
        "churned ndv gap served stale — sketches cannot retract")
      NdvView.refresh(spark, src, v)
      assert(PlanProbe.scansOnly(userAgg(), "/nview"))
    }
  }

  test("quantile: compensation covers append AND churn gaps bit-equal; escape declines") {
    withRoot { root =>
      val src = s"$root/src"; val v = s"$root/qview"
      def se(r: Range) = seriesDF(
        r.map(i => ("m" + i % 2, i.toLong * 3600, (i % 20) * 1.0)): _*)
        .select("metric", "e", "value")
      SnapshotStore.append(se(1 to 60), src)
      QuantileView.refresh(spark, src, v) // bootstrap: freeze edges
      def got(df: DataFrame): Set[(String, Long, Double, Double)] =
        df.collect().map(x =>
          (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3))).toSet
      // the gap: an in-envelope append (values repeat the observed set)
      // AND a churn delete — the one view whose compensation covers both
      SnapshotStore.append(se(61 to 80), src)
      SnapshotStore.deleteWhere(spark, src, col("e") === 3600L * 5)
      val comp = QuantileView.compensatedQuantiles(
        spark, src, v, Seq(0.5, 0.9)).getOrElse(
        fail("churn-gap quantile compensation declined"))
      val compensated = got(comp)
      assert(SnapshotStore.lastEpoch(v).contains(1L),
        "compensation must not move the view")
      // ground truth: refresh (publishes the same signed partials), serve
      QuantileView.refresh(spark, src, v)
      assert(compensated == got(QuantileView.quantiles(spark, v, Seq(0.5, 0.9)))
        && compensated.nonEmpty,
        "compensated estimates must be bit-equal to refresh-then-serve")
      // a fresh view returns the plain estimates
      assert(got(QuantileView.compensatedQuantiles(spark, src, v,
        Seq(0.5, 0.9)).get) == compensated)
      // an ESCAPING gap insert declines (refresh would refreeze)
      SnapshotStore.append(seriesDF(("m0", 999999L, 1e9))
        .select("metric", "e", "value"), src)
      assert(QuantileView.compensatedQuantiles(spark, src, v, Seq(0.5)).isEmpty,
        "escaping gap must decline — compensation cannot refreeze")
      // a compacted gap declines (no manifest diff)
      QuantileView.refresh(spark, src, v)
      SnapshotStore.compact(spark, src)
      SnapshotStore.append(se(81 to 85), src)
      assert(QuantileView.compensatedQuantiles(spark, src, v, Seq(0.5)).isEmpty,
        "compacted gap must decline")
      // grain stamp: a mismatched grainSec REFUSES (caller bug, not a
      // decline) on every mutating/compensating surface
      val e1 = intercept[IllegalArgumentException] {
        QuantileView.refresh(spark, src, v, grainSec = 3600L)
      }
      assert(e1.getMessage.contains("grainSec"))
      val e2 = intercept[IllegalArgumentException] {
        QuantileView.compensatedQuantiles(spark, src, v, Seq(0.5),
          grainSec = 3600L)
      }
      assert(e2.getMessage.contains("grainSec"))
      val e3 = intercept[IllegalArgumentException] {
        QuantileView.retighten(spark, src, v, grainSec = 3600L)
      }
      assert(e3.getMessage.contains("grainSec"))
    }
  }
}
