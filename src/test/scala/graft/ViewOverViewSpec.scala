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
  *     publishes as its own COMPACTION — a non-commutative commit) → the
  *     rollup takes its honest full-rebuild branch;
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

  test("a rollup over a join view absorbs upstream appends O(Δ) and rebuilds on upstream churn") {
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
      // own compaction → tier-2 takes the honest full rebuild
      SnapshotStore.deleteWhere(spark, l, col("value") > 4.0)
      JoinView.refreshKeys(spark, l, r, jv, Seq("uid"), Seq("uid2"))
      assert(lastOp(jv) == "compact",
        "upstream churn publishes as the view's own compaction")
      RollupView.refresh(spark, jv, rv)
      assert(lastOp(rv) == "compact",
        "the downstream rollup must rebuild across an upstream rewrite")
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
}
