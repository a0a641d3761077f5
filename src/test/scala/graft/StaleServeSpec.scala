package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{MaterializedJoins, MaterializedRollups, PlanProbe}
import graft.sources.{JoinView, RollupView, SnapshotStore}

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

      // outer view: opted in, still declines stale (conversion ≠ union)
      val vo = s"$root/view_o"
      JoinView.refresh(spark, l, r, vo, "o_id", "lo_id", "left_outer")
      MaterializedJoins.enable(l, r, vo, "o_id", "lo_id", "left_outer",
        serveStale = true)
      SnapshotStore.append(linesDF(12L), r)
      val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
      val oq = lf.join(rf, lf("o_id") === rf("lo_id"), "left_outer")
      assert(!PlanProbe.scansAny(oq, "/view"),
        "stale OUTER view served — match-arrival conversion cannot be unioned")
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
}
