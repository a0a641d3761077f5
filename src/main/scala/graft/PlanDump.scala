package graft

/** Dump `.explain("formatted")` evidence for the optimization rounds.
  *
  *   runMain graft.PlanDump <outDir> <suffix> [<query>...]
  *
  * Writes `<outDir>/<query>_<suffix>.txt` for each named registered query
  * (the query executes first — lifecycle queries build their stores — then
  * the RETURNED frame's formatted plan is dumped), plus
  * `<outDir>/restriction_standing_<suffix>.txt`: the physical plan of the
  * JoinView delta-restriction over a freshly built store (the machinery
  * every view refresh funnels through), which is where the
  * small-key-set IN pushdown / bloom-prefilter shape is visible.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = GraftSession.local()
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        text.getBytes("UTF-8"))

    // the restriction-machinery plan: a store of orders, a small delta,
    // the standing side restricted to the delta's key tuples
    locally {
      import org.apache.spark.sql.functions._
      val root = java.nio.file.Files
        .createTempDirectory("plandump_store").toString
      val orders = Tables.orders(spark, sfDir)
      graft.sources.SnapshotStore.append(orders, root)
      val delta = orders.where(col("o_orderkey") % 997 === 0)
        .limit(200).select("o_custkey")
      val restricted = graft.sources.JoinView.restrictionPlan(
        spark, root, 1, Seq("o_custkey"), delta)
      write("restriction_standing",
        restricted.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      graft.sources.SnapshotStore.deleteTree(root)
    }

    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // lifecycle runs
      write(name, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"[plandump] wrote $name")
    }
    spark.stop()
  }
}
