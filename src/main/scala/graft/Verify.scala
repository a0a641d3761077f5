package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional third arg: comma-separated query names to run (dev
    // spot-check); the driver's two-arg invocation runs everything.
    val (sfDir, outDir, only) = args match {
      case Array(s, o)         => (s, o, None)
      case Array(s, o, names)  => (s, o, Some(names.split(',').toSet))
    }
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    // Per-run export root (round-6 ADVICE): a SIBLING of outDir, not a
    // child — the checker treats every outDir subdirectory as a query
    // result, and a shared fixed path would let another run's export
    // shadow this one's. Must happen before any query runs; oracle_sql is
    // dumped after, so the SQL below points at exactly these exports.
    SparkEntry.configureOracleExport(
      new java.io.File(outDir).getAbsolutePath.stripSuffix("/") + "_oracle_export",
      enabled = true)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
