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

  /** Seeded stratified sample per stratum value (e.g. language balance).
    * Deterministic for a fixed seed; executes as a per-row Bernoulli filter
    * — no shuffle, no driver collection. */
  def stratifiedSample(df: DataFrame, stratum: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratum, fractions, seed)
}
