package graft

/** Ad-hoc perf probe: run selected queries N times each against
  * SPARK_GRAFT_SF_DIR and print per-iteration timings — separates one-time
  * costs (codegen compile, JIT, scan setup) from steady-state execution so
  * optimization effort goes where the time actually is.
  *
  * Usage: runMain graft.PerfProbe <iters> <query...>
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = if (args.nonEmpty) args(0).toInt else 3
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    sys.env.get("GRAFT_KEYCAP").foreach(v =>
      spark.conf.set(graft.sources.JoinView.SmallKeyCapConf, v))
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-24s " + times.map(t => f"$t%7.3f").mkString(" "))
    }
    spark.stop()
  }
}
