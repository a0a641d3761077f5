package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + series-builder helpers for all suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  /** Build the canonical series relation from (metric, e, value) rows. */
  def seriesDF(rows: (String, Long, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex.map { case ((m, e, v), i) =>
      (i.toLong, 0L, m, e, v, s"""{"k": $i}""")
    }.toDF("event_id", "user_id", "metric", "e", "value", "props")
  }

  /** Same but with explicit user ids (for sessionization). */
  def userSeriesDF(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex.map { case ((u, e), i) =>
      (i.toLong, u, "m", e, 1.0, "{}")
    }.toDF("event_id", "user_id", "metric", "e", "value", "props")
  }
}
