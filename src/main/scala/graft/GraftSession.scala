package graft

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured session for this engine.
  *
  * Keeps reader-relevant SQL confs out of query functions (they stay pure;
  * see VERDICT round-1 note on `Tables.eventsRaw` mutating session state).
  *
  * Scale posture: `shuffle.partitions` defaults to the local core count for
  * the harness, but on a real cluster callers pass the cluster-sized value;
  * AQE coalesces down so over-provisioning is safe.
  */
object GraftSession {

  /** Apply engine-required confs to a builder. */
  def configure(b: SparkSession.Builder, shufflePartitions: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Timestamp-generation compat (see Tables.tsEpochSeconds): nanos
      // files read as raw Long (Spark rejects TIMESTAMP(NANOS) otherwise);
      // naive-micros files read as plain TIMESTAMP rather than
      // TIMESTAMP_NTZ, matching DuckDB's naive-as-UTC oracle reading.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
