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

  /** `events.parquet`'s `ts` physical type has varied across harness data
    * generations — parquet `TIMESTAMP(NANOS)` (readable only as raw Long
    * nanos via `nanosAsLong`), `TIMESTAMP(MICROS)` naive (read as
    * TIMESTAMP_NTZ unless NTZ inference is off), and adjusted-to-UTC micros
    * (plain TIMESTAMP, also what [[graft.ScaleUp]] writes back). Sessions
    * built via [[GraftSession]] set both compat confs; [[tsEpochSeconds]]
    * then derives epoch seconds exactly for whichever type arrives.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /** Exact epoch-seconds derivation for any `ts` generation, matching
    * DuckDB's `epoch_ns(ts)//1e9` bit for bit: Long nanos → integer `div`;
    * TIMESTAMP (micros) → long cast (floorDiv micros 1e6); TIMESTAMP_NTZ →
    * wall-clock taken as UTC (the session timezone every entry point pins)
    * then the same long cast. No doubles anywhere near second boundaries.
    */
  def tsEpochSeconds(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast("timestamp").cast("long")
      case _ => col("ts").cast("long")
    }

  /** The engine's canonical timeseries relation: one row per sample,
    * `(metric, e, value, ...)` with `e` = epoch seconds. This is the Spark
    * shape of the reference's per-(sensor,metric) tuple arrays
    * (`trend-o-meter:11-16`): the newest-first array invariant becomes an
    * explicit ORDER BY where an operator needs order.
    */
  def metricSeries(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.select(
      col("event_id"),
      col("user_id"),
      col("event_type").as("metric"),
      tsEpochSeconds(raw).as("e"),
      col("value"),
      col("props")
    )
  }

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

  /** Declared schema of the canonical series relation, for schema-on-read
    * sources (JSONL/CSV ingestion paths). */
  val seriesSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT, metric STRING, e BIGINT, value DOUBLE, props STRING")

  /** S2+F3 batch-side over JSON-lines: declared schema, PERMISSIVE parse,
    * malformed lines dropped (not failed) — the reference's
    * catch-log-and-skip (trend-o-meter:440-443) as a reader policy. */
  def seriesFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(seriesSchema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .where(col("_corrupt").isNull && col("e").isNotNull && col("metric").isNotNull)
      .drop("_corrupt")

  /** Same canonical relation over ORC (the columnar alternative container;
    * schema enforced at read). */
  def seriesFromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(seriesSchema).orc(path)

  /** Same contract over CSV (header, typed schema, malformed dropped). */
  def seriesFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(seriesSchema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(path)
      .where(col("e").isNotNull && col("metric").isNotNull)

  /** 100 TB layout: write the canonical series partitioned by metric so
    * per-metric queries prune whole directories at planning time (at real
    * scale, add a day bucket: `partitionBy("metric", "day")`). */
  def writeSeriesPartitioned(series: DataFrame, path: String): Unit =
    series.write.mode("overwrite").partitionBy("metric").parquet(path)

  /** Co-located join layout: bucket (and sort) by the join key at write
    * time; two tables bucketed the same way join with NO exchange — the
    * repeated-join amortization strategy at 100 TB. Requires the session
    * catalog (`saveAsTable` — a bare parquet path has nowhere to record
    * the bucket spec). `path` makes it an EXTERNAL table at that
    * location (e.g. a temp root); None = managed under the warehouse
    * dir. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String,
                    path: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // Idempotent across JVMs AND re-runs: a fresh in-memory catalog
    // doesn't know about a previous run's table directory, DROP TABLE on
    // an external/stale table leaves its files behind, and saveAsTable
    // would either refuse the location or write new bucket files BESIDE
    // the old ones (silently duplicated rows) — drop the catalog entry,
    // the table's PREVIOUS location (read from the catalog before the
    // drop: a re-run may target a different path, and deleting only the
    // new one would strand the old files), and the new location.
    val prevLoc: Option[String] =
      if (!spark.catalog.tableExists(table)) None
      else scala.util.Try(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .location.toString).toOption
    // Self-referential rewrites are refused LOUDLY: df is lazy, so
    // "re-bucket the table into itself" would delete the previous
    // location before the scan materializes — unrecoverable data loss
    // (or a silently empty table under ignoreMissingFiles). Both
    // locations this call deletes are guarded: the table's previous
    // catalog location AND the target path (data staged at the target —
    // e.g. first registration over an existing directory — is input
    // too). A migration must stage through a different location first.
    val norm = (s: String) =>
      java.nio.file.Paths.get(s.replaceFirst("^file:/+", "/"))
        .normalize.toAbsolutePath.toString
    val newLoc = path.getOrElse(new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase).toString)
    locally {
      val reads = graft.plans.PlanProbe.scanRoots(df).map(norm)
      (prevLoc.toSeq :+ newLoc).map(norm).distinct.foreach { loc =>
        require(!reads.exists(r => r == loc || r.startsWith(loc + "/")),
          s"writeBucketed: df reads from `$loc`, which this rewrite for " +
            s"table `$table` deletes before df executes — stage the data " +
            "through another location first")
      }
    }
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    (prevLoc.toSeq :+ newLoc).distinct.foreach { l =>
      val p = new org.apache.hadoop.fs.Path(l)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
    path.foreach(p => w.option("path", p))
    w.saveAsTable(table)
  }
}
