package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** S6 display fidelity: the reference's character grid
  * (`writeAt(col,row,str)` / `clear()`, trend-o-meter:89-107) and its main
  * layout — one row per metric, one column block per day bin, label
  * abbreviated and cells rendered with the X4 per-metric renderers
  * (trend-o-meter:153-163). Driver-side presentation over a display-sized
  * result; never touches the fact table. */
final class DisplayGrid(val cols: Int, val rows: Int) {
  private val cells = Array.fill(rows, cols)(' ')

  def clear(): Unit = for (r <- 0 until rows; c <- 0 until cols) cells(r)(c) = ' '

  /** Write `str` starting at (col, row), clipped at the grid edge. */
  def writeAt(col: Int, row: Int, str: String): Unit =
    if (row >= 0 && row < rows)
      str.zipWithIndex.foreach { case (ch, i) =>
        val c = col + i
        if (c >= 0 && c < cols) cells(row)(c) = ch
      }

  def render: Seq[String] = cells.map(_.mkString).toSeq
}

object DisplayGrid {

  /** Lay the flagship extents out on a grid: metrics down, bins across,
    * `min/max` per cell. Numeric bin ordering (the reference string-sorts
    * and breaks for bins >= 10 — trend-o-meter:157; SURVEY §7). */
  def layoutExtents(extents: DataFrame, grid: DisplayGrid,
                    labelWidth: Int = 8, cellWidth: Int = 12): Unit = {
    val rendered = extents
      .where(col("is_complete"))
      .select(
        Scalars.deVoweled(col("metric")).as("label"),
        col("metric"), col("day_bin"),
        concat(
          Scalars.renderFor(col("metric"), col("min_val")), lit("/"),
          Scalars.renderFor(col("metric"), col("max_val"))).as("cell"))
      .collect() // display-sized: metrics × bins
    val metricRows = rendered.map(_.getAs[String]("metric")).distinct.sorted.zipWithIndex.toMap
    val binCols = rendered.map(_.getAs[Int]("day_bin")).distinct.sorted.zipWithIndex.toMap
    grid.clear()
    rendered.foreach { r =>
      val row = metricRows(r.getAs[String]("metric"))
      grid.writeAt(0, row, r.getAs[String]("label").take(labelWidth))
      grid.writeAt(labelWidth + binCols(r.getAs[Int]("day_bin")) * cellWidth, row,
        r.getAs[String]("cell").take(cellWidth - 1))
    }
  }
}
