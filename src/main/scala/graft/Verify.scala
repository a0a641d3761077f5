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
    // Arg-order guard (round-9 VERDICT): Verify takes (sfDir, outDir) while
    // tools/check.py takes (outDir, sfDir) — swap-bait. A swapped call used
    // to fail every query with PATH_NOT_FOUND yet exit 0; name-check the
    // data dir up front so the mistake is one loud line, not 139 stderr
    // lines and a green sbt exit.
    // exists, not isRegularFile: ScaleUp sf dirs carry each table as a
    // DIRECTORY of part files; both layouts are valid Spark reads.
    if (!Files.exists(Paths.get(sfDir, "events.parquet")))
      sys.error(s"sfDir '$sfDir' does not contain events.parquet — " +
        "expected a testdata sf directory as the FIRST arg " +
        "(usage: Verify <sfDir> <outDir> [query,query...])")
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    var ran = 0
    var failed = 0
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
      ran += 1
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
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
    // Per-query failures stay soft (the checker reports them as err rows),
    // but a majority-failed run means the invocation itself is broken
    // (bad path, bad build) — exit nonzero so sbt doesn't print [success]
    // over a run that produced nothing comparable.
    if (ran > 0 && failed * 2 > ran)
      sys.error(s"$failed of $ran queries failed — refusing to report success")
    else if (failed > 0)
      System.err.println(s"[verify] $failed of $ran queries failed")
  }
}
