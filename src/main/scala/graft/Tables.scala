package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables.
  *
  * All readers are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom; callers `.select(...)` the columns they need and
  * the projection reaches the scan (`ReadSchema` in `.explain`).
  */
object Tables {

  /** `events.parquet` carries parquet `TIMESTAMP(NANOS)` which Spark's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Sessions built via
    * [[GraftSession]] set `spark.sql.legacy.parquet.nanosAsLong=true` so the
    * column arrives as a raw Long; we derive epoch *seconds* with exact
    * integer math — no double rounding near second boundaries, identical to
    * DuckDB's `epoch_ns(ts)//1e9`.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /** The engine's canonical timeseries relation: one row per sample,
    * `(metric, e, value, ...)` with `e` = epoch seconds. This is the Spark
    * shape of the reference's per-(sensor,metric) tuple arrays
    * (`trend-o-meter:11-16`): the newest-first array invariant becomes an
    * explicit ORDER BY where an operator needs order.
    */
  def metricSeries(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir).select(
      col("event_id"),
      col("user_id"),
      col("event_type").as("metric"),
      expr("ts div 1000000000").as("e"),
      col("value"),
      col("props")
    )

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
}
