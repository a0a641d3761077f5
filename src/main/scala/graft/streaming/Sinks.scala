package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.TrendParams
import graft.functions.Scalars

/** Sink shapes of the reference (S6 display, S7 last-value upsert, S8 append
  * audit log) as `foreachBatch` functions. All are idempotent under batch
  * replay — the reference's reconnect re-render (M5, trend-o-meter:277-284)
  * is free here because sinks render from state, not from deltas.
  */
object Sinks {

  /** S6: display sink — format extents rows with the X4 renderers and hand
    * the rendered frame to a writer (console, test buffer, device adapter).
    * The reference's character grid (`writeAt`, trend-o-meter:89-107) is the
    * `render` callback's concern; analytics stop at formatted strings.
    * X10: the frame-tick character alternates with batch parity
    * (trend-o-meter:337-378's liveness indicator). */
  def displaySink(render: Seq[String] => Unit,
                  p: TrendParams = TrendParams.default)(batch: DataFrame, batchId: Long): Unit = {
    val tick = if (batchId % 2 == 0) "~" else "*"
    val w = p.mainMetricWidth + 2 // reference cell = value width + padding
    val lines = batch
      .withColumn("cell", concat_ws(" ",
        Scalars.labelCell(Scalars.deVoweled(col("metric")), 10),
        col("day_bin").cast("string"),
        Scalars.fixedWidth(Scalars.renderFor(col("metric"), col("min_val")), w),
        Scalars.fixedWidth(Scalars.renderFor(col("metric"), col("max_val")), w)))
      .where(col("is_complete"))
      .orderBy("metric", "day_bin")
      .select("cell")
      .collect() // display-sized result set (metrics × bins), never the fact table
      .map(_.getString(0))
      .toSeq
    render(s"$tick frame $batchId" +: lines)
  }

  /** S7: last-value upsert sink — the reference HSETs the response hash so a
    * late subscriber reads the latest value per field
    * (trend-o-meter:243-250). "Last" must be defined by event order, not by
    * collect()'s partition order, so the caller names the ordering column;
    * the max-order row per key wins deterministically.
    *
    * The collect is key-cardinality-sized (one row per distinct key), and
    * `maxKeys` makes that contract ENFORCED rather than assumed: a caller
    * that accidentally keys by a high-cardinality column fails loudly at
    * the first oversized batch instead of creeping toward driver OOM. */
  def lastValueSink(store: TrieMap[String, String], keyCol: String, valCol: String,
                    orderCol: String, maxKeys: Int = 100000)
                   (batch: DataFrame, batchId: Long): Unit = {
    val rows = batch
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(max(struct(col(orderCol), col(valCol).as("__v"))).as("__last"))
      .select(col("__k"), to_json(struct(col("__last.__v").as(valCol))))
      .limit(maxKeys + 1)
      .collect()
    if (rows.length > maxKeys)
      throw new IllegalStateException(
        s"lastValueSink: batch $batchId carries more than $maxKeys distinct " +
        s"'$keyCol' keys — this sink is for display/response-hash " +
        "cardinalities; key by a bounded column or raise maxKeys")
    rows.foreach { r: Row => store.put(r.getString(0), r.getString(1)) }
  }

  /** S8: audit sink (trend-o-meter:253-262) — each batch as JSON lines
    * with its batch id, the command-log shape. One OVERWRITTEN directory
    * per batch id (not a blind append): a replayed batch rewrites its own
    * directory, which is what makes this sink idempotent under the
    * foreachBatch replay contract. Read the log back with
    * `option("recursiveFileLookup", "true")`. */
  def auditSink(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").json(s"$path/batch-$batchId")
}
