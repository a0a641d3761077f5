package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton-curve) interleaving so that
  * range-partitioned files stay tight in BOTH clustering dimensions at
  * once — the standard warehouse trick (Morton 1966; the technique behind
  * multi-dimensional clustering in modern lakehouse writers) for making
  * parquet min/max footer stats prune files under 2-d predicates.
  *
  * Why it matters at 100 TB: a table laid out by one column prunes scans on
  * that column only; a query filtering the OTHER dimension reads every
  * file. Interleaving the bits of both keys into one sort key bounds each
  * file's extent in both dimensions, so `x BETWEEN … AND y BETWEEN …`
  * predicates skip most files using footer stats alone — no index, no
  * extra structure, just write order.
  *
  * Everything here is built-in bitwise `Column` algebra (shiftleft /
  * bitwiseAND / bitwiseOR) — fully codegen'd, no UDF, map-side only; the
  * single shuffle is the `repartitionByRange` that any clustered write
  * needs anyway.
  */
object LayoutOps {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i — the
    * public "interleave by binary magic numbers" construction (each step
    * doubles the gap: |<<8 &00FF00FF, |<<4 &0F0F0F0F, |<<2 &33333333,
    * |<<1 &55555555). Input is masked to 16 bits first. */
  def spread16(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = (m0.bitwiseOR(shiftleft(m0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val m2 = (m1.bitwiseOR(shiftleft(m1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = (m2.bitwiseOR(shiftleft(m2, 2))).bitwiseAND(lit(0x33333333L))
    (m3.bitwiseOR(shiftleft(m3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: x holds the even bit
    * positions, y the odd ones. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster `df` for a 2-d-prunable write: Morton code of the two keys
    * (masked to 16 bits), range-partitioned into `numFiles` output files
    * and sorted within each — so every file covers one contiguous stretch
    * of the Z-curve and its parquet footer min/max stays tight in both
    * `x` and `y`. */
  def zorderLayout(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** [[zorderLayout]] with each key min-max scaled to fill the 16-bit
    * layout domain first. Raw interleaving only clusters when both keys
    * actually span their bit planes; real key domains rarely do (a 10-value
    * dimension uses 4 of its 16 positions, so file-sized stretches of the
    * curve cycle through the WHOLE dimension and nothing prunes). Scaling
    * makes the two planes comparable — the same reason production
    * multi-dimensional clustering writers normalize columns (by range or
    * rank) before interleaving.
    *
    * The min/max pre-pass is one tiny aggregate (4 longs to the driver —
    * model-sized); at 100 TB you'd feed persisted column stats or a
    * quantile sketch instead, and rank-based scaling would also absorb
    * skew — the knob, not the structure. Key spreads above 2^47 would
    * overflow the 65535-scaling multiply; mask such keys first. */
  def zorderLayoutScaled(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val b = df.agg(min(x).cast("long").as("xlo"), max(x).cast("long").as("xhi"),
      min(y).cast("long").as("ylo"), max(y).cast("long").as("yhi")).head()
    // No usable bounds: empty input, or a clustering key that is entirely
    // NULL (its min/max are null; getAs[Long] would silently unbox to 0
    // and z-values of surviving rows would go NULL — a silently degraded
    // layout). Each key needs BOTH bounds, so check all four fields.
    if ((0 until 4).exists(b.isNullAt)) return df
    // Integer-exact scaling via named intermediates (Column API has no
    // integer div; expr needs names).
    val out = df
      .withColumn("__xd", x.cast("long") - lit(b.getAs[Long]("xlo")))
      .withColumn("__yd", y.cast("long") - lit(b.getAs[Long]("ylo")))
      .withColumn("__xs",
        if (b.getAs[Long]("xhi") <= b.getAs[Long]("xlo")) lit(0L)
        else expr(s"(__xd * 65535) div ${b.getAs[Long]("xhi") - b.getAs[Long]("xlo")}"))
      .withColumn("__ys",
        if (b.getAs[Long]("yhi") <= b.getAs[Long]("ylo")) lit(0L)
        else expr(s"(__yd * 65535) div ${b.getAs[Long]("yhi") - b.getAs[Long]("ylo")}"))
    zorderLayout(out, col("__xs"), col("__ys"), numFiles)
      .drop("__xd", "__yd", "__xs", "__ys")
  }

  /** Per-output-file bounding boxes of a candidate layout: what the parquet
    * footers would record. Used to MEASURE clustering quality (sum of
    * normalized bbox areas ≈ expected fraction of files a uniform 2-d
    * point predicate cannot prune). */
  def fileBoundingBoxes(laidOut: DataFrame, x: Column, y: Column): DataFrame =
    laidOut
      .withColumn("__file", spark_partition_id())
      .groupBy("__file")
      .agg(
        count(lit(1)).as("n_rows"),
        min(x).as("x_min"), max(x).as("x_max"),
        min(y).as("y_min"), max(y).as("y_max"))

}
