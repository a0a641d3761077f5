package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{AggJoinView, JoinView, NdvView, QuantileView, RollupView, SearchIndex, SnapshotStore}

/** SERVING-path spot at big scale (round-16 stretch): where
  * [[ScaleGate]] proves the MAINTENANCE legs stay O(Δ) across 10×
  * standing data, this measures the READ paths a 100 TB cluster hits
  * per-query — the Catalyst view rewrites (rollup/NDV/quantile/join/
  * agg-join) and the index's bloom-pruned retrieval — against a large
  * ScaleUp fixture (sf100 ≈ 15 GB locally), printing per-serve wall
  * times, the DECLINED base path's time next to each rewrite (the
  * number the rewrite saves), and the index legs' selected/total
  * posting-file counts.
  *
  * Usage: runMain graft.ScaleServe <sfDir> [families]
  * (families = comma list of
  * rollup,ndv,quantile,join,aggjoin,stale,search)
  */
object ScaleServe {

  private def timed[A](what: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[serve] $what%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  private def withRoot(f: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("serve100").toString
    try f(root) finally SnapshotStore.deleteTree(root)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: ScaleServe <sfDir> [families]"))
    val fams = args.lift(1).map(_.split(',').toSet)
      .getOrElse(Set("rollup", "ndv", "quantile", "join", "aggjoin",
        "maggjoin", "mndvjoin", "stale", "search"))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    println(s"[serve] == $dir ==")

    def series: DataFrame =
      Tables.metricSeries(spark, dir).select("metric", "e", "value")

    if (fams("rollup")) withRoot { root =>
      val src = s"$root/src"; val v = s"$root/view"
      timed("rollup source append")(SnapshotStore.append(series, src))
      timed("rollup bootstrap")(RollupView.refresh(spark, src, v))
      graft.plans.MaterializedRollups.enable(src, v)
      try {
        def agg() = SnapshotStore.read(spark, src)
          .groupBy(col("metric"), expr("e div 86400").as("day"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).as("vsum"),
            min(col("value")).as("mn"), max(col("value")).as("mx"))
        val served = agg()
        require(graft.plans.PlanProbe.scansOnly(served, "/view"),
          "rollup rewrite declined at scale")
        timed("rollup SERVED day agg")(served.collect())
        graft.plans.MaterializedRollups.disable(src)
        timed("rollup DECLINED base agg")(agg().collect())
      } finally graft.plans.MaterializedRollups.disable(src)
    }

    if (fams("ndv")) withRoot { root =>
      val src = s"$root/src"; val v = s"$root/view"
      val ev = Tables.metricSeries(spark, dir).select("metric", "e", "user_id")
      timed("ndv source append")(SnapshotStore.append(ev, src))
      timed("ndv bootstrap")(NdvView.refresh(spark, src, v))
      graft.plans.MaterializedRollups.enableNdv(src, v, serveStale = true)
      try {
        def agg() = SnapshotStore.read(spark, src)
          .groupBy(col("metric"), expr("e div 86400").as("day"))
          .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(user_id, ${NdvView.LgK}))")
            .as("approx_users"))
        val served = agg()
        require(graft.plans.PlanProbe.scansOnly(served, "/view"),
          "ndv rewrite declined at scale")
        timed("ndv SERVED day agg")(served.collect())
        // stale: a bounded append gap (existing metrics, shifted days),
        // NO refresh — the sketch-union compensation serves bit-equal
        SnapshotStore.append(
          ev.where(expr("e % 9973 = 0"))
            .withColumn("e", col("e") + lit(400L * 86400L)), src)
        val stale = agg()
        require(graft.plans.PlanProbe.scansAny(stale, "/view"),
          "stale ndv rewrite declined at scale")
        timed("ndv STALE-COMPENSATED agg")(stale.collect())
        graft.plans.MaterializedRollups.disable(src)
        timed("ndv DECLINED base agg (stale)")(agg().collect())
      } finally graft.plans.MaterializedRollups.disable(src)
    }

    if (fams("quantile")) withRoot { root =>
      val src = s"$root/src"; val v = s"$root/view"
      timed("qview source append")(SnapshotStore.append(series, src))
      timed("qview bootstrap")(QuantileView.refresh(spark, src, v))
      timed("qview SERVED p50/p99")(
        QuantileView.quantiles(spark, v, Seq(0.5, 0.99)).collect())
      // stale: in-envelope append gap (values repeat the observed set,
      // shifted days), NO refresh — signed-count compensation on the fly
      SnapshotStore.append(
        series.where(expr("e % 9973 = 0"))
          .withColumn("e", col("e") + lit(400L * 86400L)), src)
      timed("qview COMPENSATED p50/p99")(
        QuantileView.compensatedQuantiles(spark, src, v, Seq(0.5, 0.99))
          .getOrElse(sys.error("quantile compensation declined at scale"))
          .collect())
      timed("qview DECLINED exact percentiles")(
        SnapshotStore.read(spark, src)
          .groupBy(col("metric"), expr("e div 86400").as("bucket"))
          .agg(expr("percentile(value, array(0.5, 0.99))")).collect())
    }

    // fact×dim join views: orders ⋈ customer (the dims are byte-copied by
    // ScaleUp, so this is the real big-fact/small-dim serving shape)
    def factDim(root: String): (String, String) = {
      val l = s"$root/L"; val r = s"$root/R"
      timed("dim append (customer)")(SnapshotStore.append(
        Tables.customer(spark, dir)
          .select("c_custkey", "c_mktsegment", "c_acctbal"), l))
      timed("fact append (orders)")(SnapshotStore.append(
        Tables.orders(spark, dir)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"), r))
      (l, r)
    }

    if (fams("join")) withRoot { root =>
      val (l, r) = factDim(root); val v = s"$root/view"
      timed("join view bootstrap (O(join) write)")(
        JoinView.refresh(spark, l, r, v, "c_custkey", "o_custkey"))
      graft.plans.MaterializedJoins.enable(l, r, v, "c_custkey", "o_custkey")
      try {
        def q() = {
          val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
          lf.join(rf, lf("c_custkey") === rf("o_custkey"))
        }
        val served = q()
        require(graft.plans.PlanProbe.scansOnly(served, "/view"),
          "join rewrite declined at scale")
        timed("join SERVED count")(println(s"[serve]   rows=${served.count()}"))
        graft.plans.MaterializedJoins.disable(l)
        timed("join DECLINED base count")(println(s"[serve]   rows=${q().count()}"))
      } finally graft.plans.MaterializedJoins.disable(l)
    }

    if (fams("aggjoin")) withRoot { root =>
      val (l, r) = factDim(root); val v = s"$root/view"
      timed("aggjoin bootstrap (O(groups) write)")(
        AggJoinView.refresh(spark, l, r, v, "c_custkey", "o_custkey",
          Seq("c_mktsegment", "o_orderstatus"), Seq("o_totalprice")))
      graft.plans.MaterializedAggJoins.enable(l, r, v, "c_custkey", "o_custkey",
        Seq("c_mktsegment", "o_orderstatus"), Seq("o_totalprice"))
      try {
        def q() = {
          val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
          lf.join(rf, lf("c_custkey") === rf("o_custkey"))
            .groupBy("c_mktsegment", "o_orderstatus")
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        }
        val served = q()
        require(graft.plans.PlanProbe.scansOnly(served, "/view"),
          "agg-join rewrite declined at scale")
        timed("aggjoin SERVED group agg")(served.collect())
        graft.plans.MaterializedAggJoins.disable(l)
        timed("aggjoin DECLINED base agg")(q().collect())
      } finally graft.plans.MaterializedAggJoins.disable(l)
    }

    // multi-way (snowflake) MV at scale: the 5-table q9 shape —
    // lineitem × part × supplier × nation × orders — served from
    // O(groups) partials vs the declined 5-way shuffle join + aggregate
    if (fams("maggjoin")) withRoot { root =>
      import graft.sources.MultiAggJoinView
      import graft.sources.MultiAggJoinView.Edge
      val fr = s"$root/F"; val pr = s"$root/P"; val sr = s"$root/S"
      val nr = s"$root/N"; val or_ = s"$root/O"; val v = s"$root/V"
      val roots = Seq(fr, pr, sr, nr, or_)
      val edges = Seq(
        Edge(0, Seq("l_partkey"), Seq("p_partkey")),
        Edge(0, Seq("l_suppkey"), Seq("s_suppkey")),
        Edge(2, Seq("s_nationkey"), Seq("n_nationkey")),
        Edge(0, Seq("l_orderkey"), Seq("o_orderkey")))
      timed("maggjoin fact append (lineitem)")(SnapshotStore.append(
        Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"),
        fr))
      timed("maggjoin dims append")(Seq(
        (Tables.part(spark, dir).select("p_partkey", "p_brand"), pr),
        (Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"), sr),
        (Tables.nation(spark, dir).select("n_nationkey", "n_name"), nr),
        (Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"), or_))
        .foreach { case (df, p) => SnapshotStore.append(df, p) })
      timed("maggjoin bootstrap (O(groups) write)")(
        MultiAggJoinView.refresh(spark, roots, v, edges,
          Seq("n_name", "o_orderpriority"), Seq("l_extendedprice")))
      graft.plans.MaterializedMultiJoins.enable(roots, v, edges,
        Seq("n_name", "o_orderpriority"), Seq("l_extendedprice"))
      try {
        def q() = {
          val Seq(f, p, s, n, o) = roots.map(SnapshotStore.read(spark, _))
          f.join(p, f("l_partkey") === p("p_partkey"))
            .join(s, f("l_suppkey") === s("s_suppkey"))
            .join(n, s("s_nationkey") === n("n_nationkey"))
            .join(o, f("l_orderkey") === o("o_orderkey"))
            .groupBy("n_name", "o_orderpriority")
            .agg(count(lit(1)).as("n"),
              sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"),
              avg(col("l_extendedprice").cast("decimal(18,2)")).as("ap"))
        }
        val served = q()
        require(graft.plans.PlanProbe.scansOnly(served, "/V"),
          "multi-way rewrite declined at scale")
        timed("maggjoin SERVED 5-way agg")(served.collect())
        graft.plans.MaterializedMultiJoins.disable(v)
        timed("maggjoin DECLINED 5-way base agg")(q().collect())
      } finally graft.plans.MaterializedMultiJoins.disable(v)
    }

    if (fams("mndvjoin")) withRoot { root =>
      import graft.sources.{MultiNdvJoinView, NdvView}
      import graft.sources.MultiAggJoinView.Edge
      val or_ = s"$root/O"; val cr = s"$root/C"; val nr = s"$root/N"
      val v = s"$root/V"
      val roots = Seq(or_, cr, nr)
      val edges = Seq(
        Edge(0, Seq("o_custkey"), Seq("c_custkey")),
        Edge(1, Seq("c_nationkey"), Seq("n_nationkey")))
      timed("mndvjoin sources append")(Seq(
        (Tables.orders(spark, dir)
          .select("o_orderkey", "o_custkey", "o_orderstatus"), or_),
        (Tables.customer(spark, dir)
          .select("c_custkey", "c_nationkey"), cr),
        (Tables.nation(spark, dir).select("n_nationkey", "n_name"), nr))
        .foreach { case (df, p) => SnapshotStore.append(df, p) })
      timed("mndvjoin bootstrap (O(groups) sketch write)")(
        MultiNdvJoinView.refresh(spark, roots, v, edges,
          Seq("n_name", "o_orderstatus"), "o_custkey"))
      graft.plans.MaterializedMultiJoins.enableNdv(roots, v, edges,
        Seq("n_name", "o_orderstatus"), "o_custkey")
      try {
        def q() = {
          val Seq(o, c, n) = roots.map(SnapshotStore.read(spark, _))
          o.join(c, o("o_custkey") === c("c_custkey"))
            .join(n, c("c_nationkey") === n("n_nationkey"))
            .groupBy("n_name", "o_orderstatus")
            .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(o_custkey, " +
              s"${NdvView.LgK}))").as("au"))
        }
        val served = q()
        require(graft.plans.PlanProbe.scansOnly(served, "/V"),
          "n-way ndv rewrite declined at scale")
        timed("mndvjoin SERVED distinct-count over tree")(served.collect())
        graft.plans.MaterializedMultiJoins.disable(v)
        timed("mndvjoin DECLINED base (3-way join + sketch)")(q().collect())
      } finally graft.plans.MaterializedMultiJoins.disable(v)
    }

    if (fams("stale")) withRoot { root =>
      // delta-compensated serving at scale: fixed-absolute append gaps
      // (the ScaleGate replica-0 posture) on both sides AFTER the last
      // refresh; the compensated serve must cost ~the fresh serve plus
      // the delta joins, far under the declined base join+agg
      val (l, r) = factDim(root); val v = s"$root/view"
      timed("aggjoin bootstrap")(
        AggJoinView.refresh(spark, l, r, v, "c_custkey", "o_custkey",
          Seq("c_mktsegment", "o_orderstatus"), Seq("o_totalprice")))
      graft.plans.MaterializedAggJoins.enable(l, r, v, "c_custkey", "o_custkey",
        Seq("c_mktsegment", "o_orderstatus"), Seq("o_totalprice"),
        serveStale = true)
      try {
        val dL = Tables.customer(spark, dir)
          .select("c_custkey", "c_mktsegment", "c_acctbal")
          .where(col("c_custkey") < 1024)
          .withColumn("c_custkey", col("c_custkey") + lit(2_000_000_000L))
        val dR = Tables.orders(spark, dir)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .where(col("o_orderkey") < 4096)
          .withColumn("o_custkey", (col("o_custkey") % 1024) + lit(2_000_000_000L))
        SnapshotStore.append(dL, l)
        SnapshotStore.append(dR, r)
        def q() = {
          val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
          lf.join(rf, lf("c_custkey") === rf("o_custkey"))
            .groupBy("c_mktsegment", "o_orderstatus")
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        }
        val served = q()
        require(graft.plans.PlanProbe.scansAny(served, "/view"),
          "stale agg-join rewrite declined at scale")
        timed("aggjoin STALE-COMPENSATED agg")(served.collect())
        graft.plans.MaterializedAggJoins.disable(l)
        timed("aggjoin DECLINED base agg (stale)")(q().collect())
      } finally graft.plans.MaterializedAggJoins.disable(l)
    }

    if (fams("search")) withRoot { root =>
      val idx = s"$root/idx"
      timed("index bootstrap")(
        SearchIndex.index(spark, Tables.documents(spark, dir), idx))
      Seq("data", "vector", "spark").foreach { t =>
        val (sel, tot) = SnapshotStore.planFilesEq(spark, idx, -1, "term", t)
        println(s"[serve]   term '$t': ${sel.size}/$tot posting files selected")
      }
      timed("bm25 top-10")(
        SearchIndex.bm25(spark, idx, Seq("data", "vector"), k = 10).collect())
      timed("and-not top-10")(
        SearchIndex.topkExcluding(spark, idx, Seq("data"), Seq("vector"),
          k = 10).collect())
    }

    spark.stop()
  }
}
