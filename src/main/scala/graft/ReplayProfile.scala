package graft

/** Dev tool: times individual streaming replay parities in isolation so
  * harness-overhead changes can be measured without a full Bench run.
  * Usage: runMain graft.ReplayProfile [sfDir] [query ...]
  */
object ReplayProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("stream_ewma_parity", "stream_tier_parity", "stream_interval_join")
    val spark = GraftSession.local()
    SparkEntry.configureOracleExport("/tmp/graft_oracle_export", enabled = false)
    // Match Bench's slice count on request so profile numbers are
    // comparable to the driver bench (fixed per-trigger overhead dominates).
    sys.env.get("SPARK_GRAFT_SLICES").foreach { s =>
      graft.streaming.StreamReplay.defaultSlices = s.toInt }
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (n <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // slice-count sensitivity: per-trigger vs per-query fixed overhead
    val series = Tables.metricSeries(spark, sfDir).select("metric", "e", "value")
    for (slices <- Seq(1, 2, 3, 6); i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.streaming.StreamReplay.ewmaReplay(series, alpha = 0.2, slices = slices)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] ewma slices=$slices run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
