package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-curation operators: deterministic splits and stratified sampling
  * — the selection stage of a training-data pipeline. */
object CurationOps {

  /** Content-hash train/eval split (see [[TextOps.splitTag]]): stable across
    * runs, engines, and partitionings — re-ingesting the same document
    * always lands it in the same split. */
  def withSplit(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("split", TextOps.splitTag(col(textCol)))

  /** Seeded stratified sample per stratum value (e.g. language balance):
    * keep a row iff the first 4 hex digits of `md5("<seed>:<key>")` fall
    * below `floor(fraction · 16^4)` for its stratum. A per-row filter — no
    * shuffle, no driver collection, no RNG state: the same (seed, key)
    * always makes the same decision regardless of run, engine, or
    * partitioning (content-hash sampling, same contract as [[withSplit]]),
    * so the op is exactly reproducible in ANSI SQL for the oracle.
    * Fraction granularity is 1/65536; fraction >= 1 keeps everything. */
  def stratifiedSample(df: DataFrame, stratum: String,
                       fractions: Map[String, Double], seed: Long,
                       keyCol: String = "doc_id"): DataFrame = {
    val hex = substring(md5(concat_ws(":", lit(seed), col(keyCol))), 1, 4)
    val thresh = fractions.foldLeft(lit(null).cast("string")) { case (acc, (k, f)) =>
      val t = if (f >= 1.0) "g000" // beyond any hex digit — keep all
              else f"${math.floor(f * 65536).toInt}%04x"
      when(col(stratum) === k, lit(t)).otherwise(acc)
    }
    df.where(thresh.isNotNull && hex < thresh)
  }
}
