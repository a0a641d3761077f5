package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Executable example of the alternate ingestion paths: JSONL with
  * malformed-drop, CSV, and the metric-partitioned parquet layout with
  * partition pruning. Run: `sbt "runMain graft.SourceDemo"`. */
object SourceDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = Files.createTempDirectory("graft-sources").toString

    Files.writeString(Paths.get(s"$dir/events.jsonl"),
      """{"event_id": 1, "user_id": 10, "metric": "temperature", "e": 100, "value": 21.5, "props": "{}"}
        |NOT JSON — dropped, not failed
        |{"event_id": 2, "user_id": 11, "metric": "humidity", "e": 160, "value": 40.0, "props": "{}"}
        |""".stripMargin)
    println("=== JSONL ingest (1 malformed line dropped) ===")
    Tables.seriesFromJsonl(spark, s"$dir/events.jsonl").show(false)

    val part = s"$dir/series"
    Tables.writeSeriesPartitioned(Tables.metricSeries(spark, "/root/testdata/sf0.001"), part)
    val clicks = spark.read.parquet(part).where(col("metric") === "click")
    println("=== partition-pruned scan (metric=click only) ===")
    println(clicks.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    println(s"rows: ${clicks.count()}")

    // Bucketed co-located join: both sides bucketed by the join key ->
    // SortMergeJoin with zero shuffle exchanges.
    Tables.writeBucketed(
      Tables.lineitem(spark, "/root/testdata/sf0.001").select("l_orderkey", "l_quantity"),
      "demo_li", 8, "l_orderkey")
    Tables.writeBucketed(
      Tables.orders(spark, "/root/testdata/sf0.001").select("o_orderkey", "o_totalprice"),
      "demo_o", 8, "o_orderkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = spark.table("demo_li").join(spark.table("demo_o"),
      col("l_orderkey") === col("o_orderkey"))
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(j.queryExecution.executedPlan.toString).size
    println(s"=== bucketed join: $shuffles shuffle exchange(s), rows ${j.count()} ===")
    spark.stop()
  }
}
