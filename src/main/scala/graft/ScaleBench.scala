package graft

import org.apache.spark.sql.DataFrame

/** Cross-scale timing for the heavy-hitter queries (round-9 VERDICT item 6):
  * runs each named registry query at every given sf directory (min-of-2,
  * noop sink — same estimator as [[Bench]]) and reports, per query, the
  * time at each scale plus the observed scaling exponent
  * `log(t_big/t_small) / log(rows_big/rows_small)` (rows measured on the
  * query's dominant input table). A scalable plan shows an exponent <= ~1
  * (sub-linear while fixed overheads still dominate, approaching 1.0 as
  * data cost takes over); an exponent meaningfully above 1 flags a plan
  * that would not survive 100×.
  *
  * Usage: runMain graft.ScaleBench <sfDirSmall> <sfDirBig> [more dirs...]
  * Query set: SPARK_GRAFT_SCALE_QUERIES (comma list), default = flagship +
  * the most expensive batch queries from the round-9 bench.
  */
object ScaleBench {

  /** Dominant input table per benched query, for the rows denominator. */
  private val driverTable: Map[String, String] = Map(
    "a2_banded_extents" -> "events",
    "q_mktseg_revenue"  -> "lineitem",
    "q5_local_volume"   -> "lineitem",
    "q7_nation_pairs"   -> "lineitem",
    "minhash_neardup"   -> "documents",
    "a35_quantile_tier" -> "events",
    "a26_hll_tier"      -> "events",
    "dedup_incremental" -> "documents"
  ).withDefaultValue("lineitem")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleBench <sfDirSmall> <sfDirBig> [more...]")
    val dirs = args.toSeq
    val names = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("a2_banded_extents", "q_mktseg_revenue", "q5_local_volume",
        "q7_nation_pairs", "minhash_neardup"))
    val spark = GraftSession.local()
    SparkEntry.configureOracleExport("/tmp/graft_scalebench_export", enabled = false)
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val rowsOf: Map[String, Map[String, Long]] = dirs.map { d =>
      d -> Map(
        "events"    -> Tables.eventsRaw(spark, d).count(),
        "lineitem"  -> Tables.lineitem(spark, d).count(),
        "documents" -> Tables.documents(spark, d).count())
    }.toMap

    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val times = dirs.map { d =>
        time(fn(spark, d)) // warm: plan + codegen + file listing
        math.min(time(fn(spark, d)), time(fn(spark, d)))
      }
      val t = driverTable(name)
      val cells = dirs.indices.map { i =>
        // Exponent vs the PREVIOUS scale: the small→mid leg is usually
        // fixed-overhead-dominated (exp ≈ 0 or even < 0 when the bigger
        // dir's multi-file layout parallelizes a scan the single-file small
        // dir serialized); the largest leg is the one that speaks to 100×.
        val ex = if (i == 0) "" else {
          val rr = rowsOf(dirs(i))(t).toDouble / rowsOf(dirs(i - 1))(t)
          f" (x${times(i) / times(i - 1)}%.1f, exp=${math.log(times(i) / times(i - 1)) / math.log(rr)}%.2f)"
        }
        f"${dirs(i).split('/').last}=${times(i)}%.2fs$ex"
      }
      println(s"[scalebench] ${name.padTo(20, ' ')} ${cells.mkString("  ")}")
    }
    spark.stop()
  }
}
