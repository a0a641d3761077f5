package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

class QuantileSketchSpec extends SparkSpec {

  // Deterministic value stream with repeats and non-uniform spacing.
  private def stream(n: Int): Seq[Double] =
    (0 until n).map(i => ((i * 37) % 101) / 2.0 + (i % 7))

  /** The exactness-regime contract the oracle SQL mirrors: 1-based rank
    * ceil(phi*n) over ascending values, min/max-clamped at the extremes. */
  private def exactQuantile(values: Seq[Double], phi: Double): Double = {
    val sorted = values.sorted
    val n = sorted.size
    if (phi * n <= 0.5) sorted.head
    else if (phi * n >= n - 0.5) sorted.last
    else sorted(math.ceil(phi * n).toInt - 1)
  }

  test("exact regime: eps below 1/(2N) returns the ceil-rank sample, any order") {
    val values = stream(500)
    val eps = 1e-9
    for (order <- Seq(values, values.reverse, new scala.util.Random(3).shuffle(values))) {
      val sk = QuantileSketch.summarize(order.iterator, eps)
      for (phi <- Seq(0.001, 0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 0.999)) {
        assert(QuantileSketch.queryLocal(sk, eps, phi).contains(exactQuantile(values, phi)),
          s"phi=$phi")
      }
    }
  }

  test("GK bound at production eps: queried value's true rank within eps*N") {
    val values = stream(20000)
    val eps = 0.01
    val sorted = values.sorted
    val n = values.size
    val sk = QuantileSketch.summarize(values.iterator, eps)
    // the summary is actually compressed at this eps, not a full copy
    assert(sk.stats.size < n / 10)
    for (phi <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val got = QuantileSketch.queryLocal(sk, eps, phi).get
      val loRank = sorted.indexWhere(_ >= got) + 1 // first position of value
      val hiRank = sorted.lastIndexWhere(_ <= got) + 1
      val target = phi * n
      assert(loRank - eps * n <= target + 1 && target - eps * n <= hiRank + 1,
        s"phi=$phi got=$got rank=[$loRank,$hiRank]")
    }
  }

  test("merge compositionality: sharded summaries keep the bound; exact at tiny eps") {
    val values = stream(4000)
    // exact regime: merged shards answer identically to one-pass
    val tinyShards = values.grouped(700).toSeq
      .map(s => QuantileSketch.summarize(s.iterator, 1e-9))
    val mergedTiny = tinyShards.reduce((a, b) => QuantileSketch.combine(a, b, 1e-9))
    for (phi <- Seq(0.05, 0.5, 0.95))
      assert(QuantileSketch.queryLocal(mergedTiny, 1e-9, phi)
        .contains(exactQuantile(values, phi)))
    // production regime: the merged summary keeps the rank bound
    val eps = 0.02
    val sorted = values.sorted
    val n = values.size
    val merged = values.grouped(700).toSeq
      .map(s => QuantileSketch.summarize(s.iterator, eps))
      .reduce((a, b) => QuantileSketch.combine(a, b, eps))
    for (phi <- Seq(0.1, 0.5, 0.9)) {
      val got = QuantileSketch.queryLocal(merged, eps, phi).get
      val loRank = sorted.indexWhere(_ >= got) + 1
      val hiRank = sorted.lastIndexWhere(_ <= got) + 1
      val target = phi * n
      // merged error bound: inputs eps plus the merge's own eps
      assert(loRank - 2 * eps * n <= target + 1 && target - 2 * eps * n <= hiRank + 1,
        s"phi=$phi got=$got rank=[$loRank,$hiRank]")
    }
  }

  test("spark tier: minute summaries merged to hour answer like one-pass, exact regime") {
    val s = spark
    import s.implicits._
    val eps = 1e-9
    val rows = (0 until 240).map(i => ("m", (i * 37) % 3600L, stream(240)(i)))
    val df = rows.toDF("metric", "e", "value").repartition(8)
    val hour = df
      .withColumn("minute", floor(col("e") / lit(60.0)).cast("long") * 60)
      .groupBy("metric", "minute")
      .agg(QuantileSketch.summary(col("value"), eps).as("sk"))
      .withColumn("bucket_start", floor(col("minute") / lit(3600.0)).cast("long") * 3600)
      .groupBy("metric", "bucket_start")
      .agg(QuantileSketch.merged(col("sk"), eps).as("sk"))
      .select(
        QuantileSketch.quantile(col("sk"), eps, 0.5).as("p50"),
        QuantileSketch.quantile(col("sk"), eps, 0.95).as("p95"))
      .head()
    val values = rows.map(_._3)
    assert(hour.getDouble(0) == exactQuantile(values, 0.5))
    assert(hour.getDouble(1) == exactQuantile(values, 0.95))
  }

  test("stored tier: sketches round-trip parquet and answer identically") {
    val s = spark
    import s.implicits._
    // The tier contract is STORAGE: write the minute sketches, drop the
    // raw samples, read the tier back later and query it. The struct
    // column must round-trip parquet bit-exactly.
    val eps = 0.02 // production regime — compressed summaries persist too
    val rows = (0 until 2000).map(i => ("m" + (i % 3), (i * 37) % 240L, stream(2000)(i)))
    val tier = rows.toDF("metric", "e", "value")
      .withColumn("minute", floor(col("e") / lit(60.0)).cast("long") * 60)
      .groupBy("metric", "minute")
      .agg(QuantileSketch.summary(col("value"), eps).as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("qtier").toString
    val written = tier.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.get(2).toString).toMap
    tier.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    val back = reread.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.get(2).toString).toMap
    assert(back == written && back.nonEmpty) // lossless storage, field for field
    // ...and the stored tier is queryable with finite answers per group
    val answered = reread.groupBy("metric")
      .agg(QuantileSketch.merged(col("sk"), eps).as("sk"))
      .select(QuantileSketch.quantile(col("sk"), eps, 0.5).as("p50"))
      .collect().map(_.getDouble(0))
    assert(answered.length == 3 && answered.forall(v => !v.isNaN))
  }

  test("streaming twin: replayed minute sketches compose to exact hour percentiles") {
    val s = spark
    import s.implicits._
    val eps = 1e-9
    // 90 values across 3 minutes of one metric; 3 slices cut mid-minute,
    // so minute sketches genuinely merge across micro-batch boundaries.
    val vals = stream(90)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("m", i * 2L, v) }.toDF("metric", "e", "value")
    val minuteSk = graft.streaming.StreamReplay.quantileTierReplay(df, eps, slices = 3)
    assert(minuteSk.count() == 3) // 180s span / 60s windows
    val hour = minuteSk
      .select(col("metric"), col("minute_start").cast("long").as("minute"), col("sk"))
      .groupBy("metric")
      .agg(QuantileSketch.merged(col("sk"), eps).as("sk"))
      .select(QuantileSketch.quantile(col("sk"), eps, 0.5).as("p50"),
        QuantileSketch.quantile(col("sk"), eps, 0.99).as("p99"))
      .head()
    assert(hour.getDouble(0) == exactQuantile(vals, 0.5))
    assert(hour.getDouble(1) == exactQuantile(vals, 0.99))
  }
}
