package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Simulates the LEAST forgiving way the driver can invoke the contract: a
  * JVM whose default timezone is NOT UTC and a bare `SparkSession.builder`
  * session carrying none of [[GraftSession]]'s confs. Every query's
  * boundary guard must supply what oracle parity needs (the timestamp
  * reader-compat confs, UTC session timezone) — the round-2 ADVICE finding
  * this validates.
  *
  * Dumps a timezone-sensitive query subset + their oracle SQL in the same
  * layout as [[Verify]], so `tools/check.py` can compare against DuckDB:
  *
  *   sbt "runMain graft.HarnessSim /root/testdata/sf0.01 /tmp/hsim"
  *   python3 tools/check.py /tmp/hsim /root/testdata/sf0.01   # expect 0 fail
  */
object HarnessSim {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "/tmp/harness_sim"
    val spark = SparkSession.builder().master("local[8]").appName("harness-sim").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(SparkEntry.entry(spark).count() > 0, "entry smoke failed")

    // The queries where a wrong session TZ silently flips results: ISO
    // rendering (x_scalars), timestamp-literal comparisons (q1/q3), plus
    // the flagship as the nanos-conf canary.
    val picks = Seq("x_scalars", "q1_pricing", "q3_shipping_priority", "a2_banded_extents")
    new java.io.File(outDir).mkdirs()
    picks.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => picks.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[harness-sim] wrote ${picks.size} results under $outDir (JVM TZ = " +
      s"${java.util.TimeZone.getDefault.getID})")
    spark.stop()
  }
}
