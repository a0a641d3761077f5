package graft

import org.apache.spark.sql.SparkSession

/** Replica of the driver's smoke check: build a BARE session (none of
  * GraftSession's confs — exactly what the harness does) and require
  * `SparkEntry.entry` to return rows. Guards the driver-boundary conf
  * handling in SparkEntry. Run: `sbt "runMain graft.EntrySmoke"`. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_SMOKE rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
