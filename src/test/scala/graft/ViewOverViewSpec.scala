package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{JoinView, RollupView, SnapshotStore}

/** VIEW-OVER-VIEW composition — the two-tier warehouse: a maintained
  * ROLLUP whose source is a maintained JOIN view's store. A JoinView's
  * store IS a SnapshotStore with ordinary commit kinds, so the rollup's
  * cursor machinery composes with no special plumbing; the contract
  * pinned here is the COST shape of each upstream refresh as seen
  * downstream:
  *
  *   - upstream APPEND refresh (delta-join rows land as an `append`
  *     commit) → the rollup absorbs it on its O(Δ) incremental path;
  *   - upstream CHURN refresh (JoinView rewrites the view once and
  *     publishes as its own COMPACTION — a non-commutative commit, but
  *     one that RECORDS its O(Δ) change feed beside the publish) → the
  *     rollup absorbs it through its RETRACTION path (dirty-group
  *     recompute + atomic keyed replace), NOT a rebuild — the r18 ask-3
  *     composition fix;
  *   - an UNRECORDED content swap (a real SnapshotStore.compact of the
  *     join view) still takes the honest full rebuild — no feed, no
  *     diff;
  *   - content is bit-equal to a from-scratch rollup of the current join
  *     after EVERY step, and the rollup REWRITE serves aggregates over
  *     the join-view store from the downstream partials.
  */
class ViewOverViewSpec extends SparkSpec {

  private def leftDF(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"m${i % 3}", i * 3600L, (i % 7).toDouble))
      .toDF("uid", "metric", "e", "value")
  }

  private def dimDF(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"seg${i % 2}")).toDF("uid2", "segment")
  }

  private def lastOp(root: String): String =
    SnapshotStore.manifestOp(root, SnapshotStore.currentVersion(root))
      .getOrElse("?")

  /** From-scratch day rollup of the CURRENT join — the equality twin. */
  private def truth(jv: String): Set[(String, Long, Long, Double)] =
    SnapshotStore.read(spark, jv)
      .groupBy(col("metric"), expr("e div 86400").as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(30,2)")).as("vsum"))
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDecimal(3).doubleValue)).toSet

  private def rollupRows(rv: String): Set[(String, Long, Long, Double)] =
    RollupView.read(spark, rv).collect()
      .map(x => (x.getAs[String]("metric"), x.getAs[Long]("day"),
        x.getAs[Long]("cnt"), x.getAs[java.math.BigDecimal]("vsum")
          .doubleValue)).toSet

  test("a rollup over a join view absorbs upstream appends AND recorded churn O(Δ); unrecorded swaps rebuild") {
    val root = java.nio.file.Files.createTempDirectory("vov_spec").toString
    val l = s"$root/L"; val r = s"$root/R"
    val jv = s"$root/jview"; val rv = s"$root/rollup"
    try {
      SnapshotStore.append(leftDF(0L to 40L: _*), l)
      SnapshotStore.append(dimDF(0L to 60L: _*), r)
      JoinView.refreshKeys(spark, l, r, jv, Seq("uid"), Seq("uid2"))
      RollupView.refresh(spark, jv, rv)
      assert(rollupRows(rv) == truth(jv) && rollupRows(rv).nonEmpty)

      // tier-1 APPEND → tier-2 O(Δ) APPEND (both lanes incremental)
      SnapshotStore.append(leftDF(41L to 80L: _*), l)
      JoinView.refreshKeys(spark, l, r, jv, Seq("uid"), Seq("uid2"))
      assert(lastOp(jv) == "append", "upstream delta must land as append")
      RollupView.refresh(spark, jv, rv)
      assert(lastOp(rv) == "append",
        "the downstream rollup must absorb an upstream append incrementally")
      assert(rollupRows(rv) == truth(jv))

      // tier-1 CHURN → the join view rewrites once and publishes as its
      // own compaction WITH its O(Δ) feed recorded → tier-2 absorbs it
      // through the RETRACTION path (dirty-group replace), not a rebuild
      SnapshotStore.deleteWhere(spark, l, col("value") > 4.0)
      JoinView.refreshKeys(spark, l, r, jv, Seq("uid"), Seq("uid2"))
      assert(lastOp(jv) == "compact",
        "upstream churn publishes as the view's own compaction")
      RollupView.refresh(spark, jv, rv)
      assert(lastOp(rv) == "upsert",
        "the downstream rollup must absorb recorded upstream churn " +
          "through the retraction path (keyed replace), not a rebuild")
      assert(rollupRows(rv) == truth(jv))

      // a group-EMPTYING upstream churn tombstones downstream (still
      // the retraction path, still exact)
      SnapshotStore.deleteWhere(spark, l, col("metric") === "m2")
      JoinView.refreshKeys(spark, l, r, jv, Seq("uid"), Seq("uid2"))
      RollupView.refresh(spark, jv, rv)
      assert(lastOp(rv) == "upsert")
      assert(rollupRows(rv) == truth(jv))
      assert(!rollupRows(rv).exists(_._1 == "m2"))

      // an UNRECORDED content swap — a real compaction of the join view
      // (content-preserving, carries the old epoch, writes no feed) —
      // must NOT pair with any feed machinery; with unchanged content
      // and an unchanged cursor the downstream refresh is a no-op, and
      // after the next upstream delta the O(Δ) lane declines across the
      // compacted boundary and the downstream rebuilds honestly
      SnapshotStore.compact(spark, jv)
      SnapshotStore.append(leftDF(101L to 110L: _*), l)
      JoinView.refreshKeys(spark, l, r, jv, Seq("uid"), Seq("uid2"))
      RollupView.refresh(spark, jv, rv)
      assert(lastOp(rv) == "compact",
        "an unrecorded upstream content swap must still rebuild downstream")
      assert(rollupRows(rv) == truth(jv))

      // another append after the churn: both tiers back on the O(Δ) lane
      SnapshotStore.append(leftDF(81L to 100L: _*), l)
      JoinView.refreshKeys(spark, l, r, jv, Seq("uid"), Seq("uid2"))
      RollupView.refresh(spark, jv, rv)
      assert(lastOp(rv) == "append")
      assert(rollupRows(rv) == truth(jv))

      // replayed refresh is a no-op at both tiers
      val (jVer, rVer) = (SnapshotStore.currentVersion(jv),
        SnapshotStore.currentVersion(rv))
      JoinView.refreshKeys(spark, l, r, jv, Seq("uid"), Seq("uid2"))
      RollupView.refresh(spark, jv, rv)
      assert(SnapshotStore.currentVersion(jv) == jVer &&
        SnapshotStore.currentVersion(rv) == rVer)

      // the rollup REWRITE serves aggregates over the JOIN VIEW's store
      graft.plans.MaterializedRollups.enable(jv, rv)
      try {
        val q = SnapshotStore.read(spark, jv)
          .groupBy(col("metric"), expr("e div 86400").as("day"))
          .agg(count(lit(1)).as("cnt"))
        assert(graft.plans.PlanProbe.scansOnly(q, "/rollup"),
          "aggregates over the join-view store must serve from the rollup")
      } finally graft.plans.MaterializedRollups.disable(jv)
    } finally SnapshotStore.deleteTree(root)
  }

  test("an NDV view over a join view absorbs recorded upstream churn by dirty-group re-sketch (shared engine, zero plumbing)") {
    // the recorded-feed path lives in the SHARED refreshWith engine, so
    // NdvView (its HLL instance) gets incremental view-over-view churn
    // for free: dirty (metric, day) groups RE-SKETCH whole from the
    // current join view (sketches cannot retract — recompute-the-dirty-
    // group is the monotone answer) and REPLACE by key
    import graft.sources.NdvView
    val root = java.nio.file.Files.createTempDirectory("vovn_spec").toString
    val l = s"$root/L"; val r = s"$root/R"
    val jv = s"$root/jview"; val nv = s"$root/nview"
    try {
      val s = spark
      import s.implicits._
      def lrows(ids: Long*): DataFrame =
        ids.map(i => (i % 25, s"m${i % 3}", i * 3600L))
          .toDF("user_id", "metric", "e")
      val dim = (0L to 30L).map(i => (i, s"seg${i % 2}")).toDF("u_id", "seg")
      SnapshotStore.append(lrows(0L to 90L: _*), l)
      SnapshotStore.append(dim, r)
      def refreshBoth(): Unit = {
        JoinView.refreshKeys(spark, l, r, jv, Seq("user_id"), Seq("u_id"))
        NdvView.refresh(spark, jv, nv)
      }
      def truthN(): Set[(String, Long, Long)] =
        SnapshotStore.read(spark, jv)
          .groupBy(col("metric"), expr("e div 86400").as("day"))
          .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(user_id, " +
            s"${NdvView.LgK}))").as("au"))
          .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
          .toSet
      def gotN(): Set[(String, Long, Long)] =
        NdvView.read(spark, nv).collect().map(x =>
          (x.getAs[String]("metric"), x.getAs[Long]("day"),
            x.getAs[Long]("approx_users"))).toSet
      refreshBoth()
      assert(gotN() == truthN() && gotN().nonEmpty)
      // upstream churn: a user-band delete → jv compaction-publish with
      // the recorded feed → the ndv tier re-sketches dirty groups and
      // REPLACES (op pinned), bit-equal to the single-pass estimate
      SnapshotStore.deleteWhere(spark, l, col("user_id") % 5 === 0L)
      refreshBoth()
      assert(lastOp(jv) == "compact")
      assert(lastOp(nv) == "upsert",
        "the ndv tier must absorb recorded upstream churn by dirty-group " +
          "re-sketch, not a rebuild")
      assert(gotN() == truthN())
    } finally SnapshotStore.deleteTree(root)
  }

  test("an AGG-JOIN view over a join view: upstream appends absorb O(Δ), upstream churn rebuilds (pinned), serving composes") {
    // the SECOND composition (r18 ask-4): tier-2 is an AggJoinView whose
    // LEFT source is a maintained JoinView's store joined against a
    // fresh dim. Proves composition is a property of the store contract,
    // not a rollup accident. Op kinds pinned per tier: tier-1 append →
    // tier-2 `append` (the delta-join path); tier-1 churn-compaction →
    // tier-2 honest `compact` rebuild (AggJoinView does not consume
    // recorded feeds — its churn algebra needs per-SOURCE dirty keys,
    // not view-row diffs; the rollup tier is the feed consumer).
    val root = java.nio.file.Files.createTempDirectory("vov2_spec").toString
    val l = s"$root/L"; val r = s"$root/R"; val d2 = s"$root/D2"
    val jv = s"$root/jview"; val av = s"$root/aggview"
    try {
      val s = spark
      import s.implicits._
      def facts(ids: Long*): DataFrame =
        ids.map(i => (i, i % 20, (i % 9) * 2.0)).toDF("f_id", "f_uid", "amt")
      val users = (0L to 19L).map(i => (i, i % 4)).toDF("u_id", "u_gid")
      val groupsDim = (0L to 3L).map(i => (i, s"tier$i")).toDF("g_id", "g_name")
      SnapshotStore.append(facts(0L to 80L: _*), l)
      SnapshotStore.append(users, r)
      SnapshotStore.append(groupsDim, d2)
      def refreshBoth(): Unit = {
        JoinView.refreshKeys(spark, l, r, jv, Seq("f_uid"), Seq("u_id"))
        graft.sources.AggJoinView.refreshKeys(spark, jv, d2, av,
          Seq("u_gid"), Seq("g_id"), Seq("g_name"), Seq("amt"))
      }
      def truth2(): Set[(String, Long, Double)] = {
        val j = SnapshotStore.read(spark, jv)
        val g = SnapshotStore.read(spark, d2)
        j.join(g, j("u_gid") === g("g_id"))
          .groupBy("g_name")
          .agg(count(lit(1)).as("cnt"),
            sum(col("amt").cast("decimal(30,2)")).as("sa"))
          .collect().map(x => (x.getString(0), x.getLong(1),
            x.getDecimal(2).doubleValue)).toSet
      }
      def got2(): Set[(String, Long, Double)] =
        graft.sources.AggJoinView.read(spark, av).collect().map(x =>
          (x.getAs[String]("g_name"), x.getAs[Long]("cnt"),
            x.getAs[java.math.BigDecimal]("sum_amt").doubleValue)).toSet
      refreshBoth()
      assert(got2() == truth2() && got2().nonEmpty)

      // tier-1 append → tier-2 absorbs as the O(Δ) delta-join append
      SnapshotStore.append(facts(81L to 140L: _*), l)
      refreshBoth()
      assert(lastOp(av) == "append",
        "tier-2 must absorb an upstream append on the delta path")
      assert(got2() == truth2())

      // tier-1 churn (publishes as the join view's compaction) → tier-2
      // takes the honest rebuild — pinned, the documented cost shape
      SnapshotStore.deleteWhere(spark, l, col("amt") > 10.0)
      refreshBoth()
      assert(lastOp(jv) == "compact")
      assert(lastOp(av) == "compact",
        "tier-2 agg-join must rebuild across an upstream rewrite")
      assert(got2() == truth2())

      // serving composes: the user-shaped jv ⋈ dim GROUP BY serves from
      // the tier-2 view's O(groups) partials
      graft.plans.MaterializedAggJoins.enableKeys(jv, d2, av,
        Seq("u_gid"), Seq("g_id"), Seq("g_name"), Seq("amt"))
      try {
        val j = SnapshotStore.read(spark, jv)
        val g = SnapshotStore.read(spark, d2)
        val q = j.join(g, j("u_gid") === g("g_id"))
          .groupBy("g_name")
          .agg(count(lit(1)).as("n"),
            sum(col("amt").cast("decimal(18,2)")).as("sa"))
        assert(graft.plans.PlanProbe.scansOnly(q, "/aggview"),
          "the composed aggregate must serve from the tier-2 view")
      } finally graft.plans.MaterializedAggJoins.disableView(av)
    } finally SnapshotStore.deleteTree(root)
  }
}
