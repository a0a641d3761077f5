package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MaterializedJoins
import graft.sources.{JoinView, SnapshotStore}

/** Join-rewrite polarities: serve exactly when the view is fresh and the
  * shape matches; decline (and stay CORRECT off the view) otherwise. */
class JoinRewriteSpec extends SparkSpec {

  private def withStores(f: (String, String, String) => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("jrw_spec").toString
    val l = s"$root/L"
    try f(l, s"$root/R", s"$root/view")
    finally { MaterializedJoins.disable(l); SnapshotStore.deleteTree(root) }
  }

  private def seed(l: String, r: String, v: String): Unit = {
    val s = spark
    import s.implicits._
    SnapshotStore.append(
      (1L to 40L).map(i => (i, s"c${i % 4}", i * 1.0)).toDF("o_id", "cust", "total"), l)
    SnapshotStore.append(
      (1L to 60L).map(i => (i % 40 + 1, i, i * 2.0)).toDF("lo_id", "ln", "qty"), r)
    JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
    MaterializedJoins.enable(l, r, v, "o_id", "lo_id")
  }

  private def scansView(df: DataFrame): Boolean =
    graft.plans.PlanProbe.scansOnly(df, "/view")

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("o_id"), col("ln"), col("qty")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("serves a fresh user-shaped join; side filters ride; right key maps") {
    withStores { (l, r, v) =>
      seed(l, r, v)
      val lf = SnapshotStore.read(spark, l).where(col("cust") === "c1")
      val rf = SnapshotStore.read(spark, r)
      val q = lf.join(rf, lf("o_id") === rf("lo_id"))
      assert(scansView(q), "fresh matching join did not rewrite")
      val base = SnapshotStore.read(spark, l).where(col("cust") === "c1")
      val rf2 = SnapshotStore.read(spark, r)
      val truth = rows(base.join(rf2, base("o_id") === rf2("lo_id")))
      assert(rows(q) == truth && truth.nonEmpty)
      // the dropped right key is served from the left key's column
      assert(q.select(col("lo_id")).collect().map(_.getLong(0)).toSet
        == truth.map(_._1))
      // flipped operand order serves too
      val lf2 = SnapshotStore.read(spark, l)
      val q2 = rf.join(lf2, rf("lo_id") === lf2("o_id"))
      assert(scansView(q2))
    }
  }

  test("declines on staleness, serves again after refresh") {
    withStores { (l, r, v) =>
      seed(l, r, v)
      val s = spark
      import s.implicits._
      SnapshotStore.append(Seq((99L, "c9", 9.0)).toDF("o_id", "cust", "total"), l)
      def userJoin() = {
        val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
        lf.join(rf, lf("o_id") === rf("lo_id"))
      }
      val stale = userJoin()
      assert(!scansView(stale), "STALE view served — correctness bug")
      assert(rows(stale).size == 60) // declined path still answers correctly
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(scansView(userJoin()), "refreshed view not served")
    }
  }

  test("an aggregate ON TOP of the join is served too, values unchanged") {
    withStores { (l, r, v) =>
      seed(l, r, v)
      def agg() = {
        val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
        lf.join(rf, lf("o_id") === rf("lo_id"))
          .groupBy("cust").agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("q"))
      }
      val served = agg()
      assert(scansView(served), "join under an aggregate did not rewrite")
      val got = served.collect().map(x => (x.getString(0), x.getLong(1),
        x.getDouble(2))).toSet
      MaterializedJoins.disable(l) // ground truth off the sources
      val want = agg().collect().map(x => (x.getString(0), x.getLong(1),
        x.getDouble(2))).toSet
      assert(got == want && want.nonEmpty)
    }
  }

  test("composite keys: serves on the full pair set in any order, declines on a subset") {
    withStores { (l, r, v) =>
      val s = spark
      import s.implicits._
      SnapshotStore.append(
        (1L to 30L).map(i => (i % 10, i % 3, i * 1.0)).toDF("a1", "a2", "x"), l)
      SnapshotStore.append(
        (1L to 60L).map(i => (i % 10, i % 3, i * 2.0)).toDF("b1", "b2", "y"), r)
      JoinView.refreshKeys(spark, l, r, v, Seq("a1", "a2"), Seq("b1", "b2"))
      MaterializedJoins.enableKeys(l, r, v, Seq("a1", "a2"), Seq("b1", "b2"))
      try {
        def lf = SnapshotStore.read(spark, l)
        def rf = SnapshotStore.read(spark, r)
        val (l1, r1) = (lf, rf)
        val q = l1.join(r1, l1("a1") === r1("b1") && l1("a2") === r1("b2"))
        assert(scansView(q), "composite-key join did not rewrite")
        // equality order flipped in the condition: still the same pair set
        val (l2, r2) = (lf, rf)
        val q2 = l2.join(r2, l2("a2") === r2("b2") && l2("a1") === r2("b1"))
        assert(scansView(q2))
        // values: the served join equals the ground-truth join
        MaterializedJoins.disable(l)
        val (l3, r3) = (lf, rf)
        val want = l3.join(r3, l3("a1") === r3("b1") && l3("a2") === r3("b2"))
          .select(col("a1"), col("a2"), col("x"), col("y"))
          .collect().map(_.toSeq).toSeq.sortBy(_.toString)
        assert(q.select(col("a1"), col("a2"), col("x"), col("y"))
          .collect().map(_.toSeq).toSeq.sortBy(_.toString) == want)
        MaterializedJoins.enableKeys(l, r, v, Seq("a1", "a2"), Seq("b1", "b2"))
        // a SUBSET of the registered pairs is a different join: decline
        val (l4, r4) = (lf, rf)
        assert(!scansView(l4.join(r4, l4("a1") === r4("b1"))))
      } finally MaterializedJoins.disable(l)
    }
  }

  test("left-outer view serves the user's left join; asymmetric polarities hold") {
    withStores { (l, r, v) =>
      val s = spark
      import s.implicits._
      // orders 1..40, lines only for 1..25: real null-extended rows
      SnapshotStore.append(
        (1L to 40L).map(i => (i, s"c${i % 4}", i * 1.0)).toDF("o_id", "cust", "total"), l)
      SnapshotStore.append(
        (1L to 25L).map(i => (i, i, i * 2.0)).toDF("lo_id", "ln", "qty"), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", "left_outer")
      def lf = SnapshotStore.read(spark, l)
      def rf = SnapshotStore.read(spark, r)
      val (l1, r1) = (lf, rf)
      val q = l1.join(r1, l1("o_id") === r1("lo_id"), "left_outer")
      assert(scansView(q), "fresh left-outer join did not rewrite")
      val got = q.select(col("o_id"), col("lo_id"), col("ln"), col("qty"))
        .collect().map(_.toString).sorted.toSeq
      MaterializedJoins.disable(l)
      val (l2, r2) = (lf, rf)
      val want = l2.join(r2, l2("o_id") === r2("lo_id"), "left_outer")
        .select(col("o_id"), col("lo_id"), col("ln"), col("qty"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want && want.size == 40,
        "served left join diverged from ground truth (null rows included)")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", "left_outer")
      // a LEFT-side filter commutes and serves
      val (l3, r3) = (lf, rf)
      val qf = l3.where(col("cust") === "c1")
        .join(r3, l3("o_id") === r3("lo_id"), "left_outer")
      assert(scansView(qf))
      assert(qf.count() == 10)
      // a RIGHT-side filter does NOT commute with a left join: decline
      val (l4, r4) = (lf, rf)
      assert(!scansView(l4.join(r4.where(col("qty") > 10.0),
        l4("o_id") === r4("lo_id"), "left_outer")))
      // an INNER user join never serves from an outer view (null rows)
      val (l5, r5) = (lf, rf)
      assert(!scansView(l5.join(r5, l5("o_id") === r5("lo_id"))))
      // a left join in the FLIPPED orientation is a different query
      val (l6, r6) = (lf, rf)
      assert(!scansView(r6.join(l6, r6("lo_id") === l6("o_id"), "left_outer")))
    }
  }

  test("inner and left-outer views over the same pair coexist in the registry") {
    withStores { (l, r, v) =>
      val s = spark
      import s.implicits._
      SnapshotStore.append(
        (1L to 20L).map(i => (i, s"c${i % 4}", i * 1.0)).toDF("o_id", "cust", "total"), l)
      SnapshotStore.append(
        (1L to 10L).map(i => (i, i, i * 2.0)).toDF("lo_id", "ln", "qty"), r)
      val vOuter = v + "_outer"
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      JoinView.refresh(spark, l, r, vOuter, "o_id", "lo_id", "left_outer")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id")
      MaterializedJoins.enable(l, r, vOuter, "o_id", "lo_id", "left_outer")
      def lf = SnapshotStore.read(spark, l)
      def rf = SnapshotStore.read(spark, r)
      // registering the outer view must NOT evict the inner registration
      // (path-SEGMENT checks: "/view_outer/" contains "/view" as a bare
      // substring, so scansOnly's marker would conflate the two)
      val (l1, r1) = (lf, rf)
      val inner = l1.join(r1, l1("o_id") === r1("lo_id"))
      val innerRoots = graft.plans.PlanProbe.scanRoots(inner)
      assert(innerRoots.nonEmpty && innerRoots.forall(_.contains("/view/")),
        s"inner registration evicted by the outer one: $innerRoots")
      val (l2, r2) = (lf, rf)
      val outer = l2.join(r2, l2("o_id") === r2("lo_id"), "left_outer")
      val outerRoots = graft.plans.PlanProbe.scanRoots(outer)
      assert(outerRoots.nonEmpty && outerRoots.forall(_.contains("/view_outer/")),
        s"outer join not served from the outer view: $outerRoots")
      assert(inner.count() == 10 && outer.count() == 20)
    }
  }

  test("full-outer view serves the user's full join; both orientations; filters decline") {
    withStores { (l, r, v) =>
      val s = spark
      import s.implicits._
      // orders 1..40, lines for 21..50: unmatched rows on BOTH sides
      SnapshotStore.append(
        (1L to 40L).map(i => (i, s"c${i % 4}", i * 1.0)).toDF("o_id", "cust", "total"), l)
      SnapshotStore.append(
        (21L to 50L).map(i => (i, i, i * 2.0)).toDF("lo_id", "ln", "qty"), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "full_outer")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", "full_outer")
      def lf = SnapshotStore.read(spark, l)
      def rf = SnapshotStore.read(spark, r)
      val (l1, r1) = (lf, rf)
      val q = l1.join(r1, l1("o_id") === r1("lo_id"), "full_outer")
      assert(scansView(q), "fresh full-outer join did not rewrite")
      val got = q.select(col("o_id"), col("cust"), col("lo_id"), col("ln"))
        .collect().map(_.toString).sorted.toSeq
      MaterializedJoins.disable(l)
      val (l2, r2) = (lf, rf)
      val want = l2.join(r2, l2("o_id") === r2("lo_id"), "full_outer")
        .select(col("o_id"), col("cust"), col("lo_id"), col("ln"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want && want.size == 50,
        "served full join diverged from ground truth (null rows both sides)")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", "full_outer")
      // a full join is symmetric: the flipped orientation serves too
      val (l3, r3) = (lf, rf)
      assert(scansView(r3.join(l3, r3("lo_id") === l3("o_id"), "full_outer")),
        "flipped full join did not rewrite")
      // NO side filter commutes with a full join: both decline
      val (l4, r4) = (lf, rf)
      assert(!scansView(l4.where(col("cust") === "c1")
        .join(r4, l4("o_id") === r4("lo_id"), "full_outer")))
      val (l5, r5) = (lf, rf)
      assert(!scansView(l5.join(r5.where(col("qty") > 10.0),
        l5("o_id") === r5("lo_id"), "full_outer")))
      // inner / left user joins never serve from a full view (null rows)
      val (l6, r6) = (lf, rf)
      assert(!scansView(l6.join(r6, l6("o_id") === r6("lo_id"))))
      val (l7, r7) = (lf, rf)
      assert(!scansView(l7.join(r7, l7("o_id") === r7("lo_id"), "left_outer")))
    }
  }

  test("right-outer user join normalizes onto the left-outer view; filter polarity swaps") {
    withStores { (l, r, v) =>
      val s = spark
      import s.implicits._
      SnapshotStore.append(
        (1L to 40L).map(i => (i, s"c${i % 4}", i * 1.0)).toDF("o_id", "cust", "total"), l)
      SnapshotStore.append(
        (1L to 25L).map(i => (i, i, i * 2.0)).toDF("lo_id", "ln", "qty"), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", "left_outer")
      def lf = SnapshotStore.read(spark, l)
      def rf = SnapshotStore.read(spark, r)
      // R RIGHT JOIN L preserves L — exactly the maintained L ⟕ R
      val (l1, r1) = (lf, rf)
      val q = r1.join(l1, r1("lo_id") === l1("o_id"), "right_outer")
      assert(scansView(q), "right-outer spelling did not normalize onto the view")
      val got = q.select(col("o_id"), col("cust"), col("lo_id"), col("ln"))
        .collect().map(_.toString).sorted.toSeq
      MaterializedJoins.disable(l)
      val (l2, r2) = (lf, rf)
      val want = r2.join(l2, r2("lo_id") === l2("o_id"), "right_outer")
        .select(col("o_id"), col("cust"), col("lo_id"), col("ln"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want && want.size == 40,
        "served right join diverged from ground truth")
      MaterializedJoins.enable(l, r, v, "o_id", "lo_id", "left_outer")
      // filter on the PRESERVED side (L) commutes and serves
      val (l3, r3) = (lf, rf)
      assert(scansView(r3.join(l3.where(col("cust") === "c1"),
        r3("lo_id") === l3("o_id"), "right_outer")))
      // filter on the null-extended side (R) declines
      val (l4, r4) = (lf, rf)
      assert(!scansView(r4.where(col("qty") > 10.0)
        .join(l4, r4("lo_id") === l4("o_id"), "right_outer")))
      // a right join in the VIEW's own orientation (preserving R) is a
      // different query — declines
      val (l5, r5) = (lf, rf)
      assert(!scansView(l5.join(r5, l5("o_id") === r5("lo_id"), "right_outer")))
      // registration-side sugar: declaring the SAME view as a right-outer
      // of (R, L) — which IS L ⟕ R — lands as the swapped left-outer
      // registration and serves identically
      MaterializedJoins.disable(l)
      MaterializedJoins.enable(r, l, v, "lo_id", "o_id", "right_outer")
      val (l6, r6) = (lf, rf)
      assert(scansView(r6.join(l6, r6("lo_id") === l6("o_id"), "right_outer")),
        "right-outer registration sugar did not normalize")
    }
  }

  test("declines: wrong keys, outer join, non-equi, time travel") {
    withStores { (l, r, v) =>
      seed(l, r, v)
      val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
      assert(!scansView(lf.join(rf, lf("o_id") === rf("ln"))))
      assert(!scansView(lf.join(rf, lf("o_id") === rf("lo_id"), "left_outer")))
      assert(!scansView(lf.join(rf, lf("o_id") < rf("lo_id"))))
      val s = spark
      import s.implicits._
      SnapshotStore.append(Seq((100L, 100L, 1.0)).toDF("lo_id", "ln", "qty"), r)
      val oldR = SnapshotStore.read(spark, r, version = 1)
      assert(!scansView(lf.join(oldR, lf("o_id") === oldR("lo_id"))),
        "time-travel read must never rewrite")
    }
  }
}
