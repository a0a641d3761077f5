package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import graft.operators.TrendOps

/** SURVEY §5 unit plan: A1 tie-breaks, A2 band boundaries, A3 ceil edge,
  * F1 bucketized-vs-faithful divergence, M3 horizon, A5/A7 shapes. */
class TrendOpsSpec extends SparkSpec {

  private val DAY = 86400L

  test("A1 argmin/argmax picks whole tuple; ties resolved to min-ts (min) / max-ts (max)") {
    val df = seriesDF(
      ("m", 100L, 5.0), ("m", 200L, 1.0), ("m", 300L, 1.0), // tie at min=1.0
      ("m", 400L, 9.0), ("m", 500L, 9.0))                   // tie at max=9.0
    val r = TrendOps.argMinMax(df).collect().head
    assert(r.getAs[Double]("min_val") == 1.0 && r.getAs[Long]("min_ts") == 200L)
    assert(r.getAs[Double]("max_val") == 9.0 && r.getAs[Long]("max_ts") == 500L)
    assert(r.getAs[Long]("n") == 5L)
  }

  test("A2 bands are disjoint; boundary sample falls in the OLDER band (strict >)") {
    val anchor = 100L * DAY
    val df = seriesDF(
      ("m", anchor, 1.0),               // newest: band 1
      ("m", anchor - DAY + 1, 2.0),     // just inside band 1
      ("m", anchor - DAY, 3.0),         // exactly on boundary -> band 3
      ("m", anchor - 3 * DAY, 4.0),     // boundary -> band 5
      ("m", anchor - 7 * DAY, 5.0),     // boundary of last band -> excluded
      ("m", anchor - 8 * DAY, 6.0))     // beyond horizon -> excluded
    val rows = TrendOps.bandedExtents(df).collect()
    val byBin = rows.map(r => r.getAs[Int]("day_bin") -> r).toMap
    assert(byBin.keySet == Set(1, 3, 5))
    assert(byBin(1).getAs[Long]("slice_len") == 2L)
    assert(byBin(3).getAs[Long]("slice_len") == 1L)
    assert(byBin(3).getAs[Double]("min_val") == 3.0)
    assert(byBin(5).getAs[Double]("min_val") == 4.0)
  }

  test("A2 empty bands are absent; anchor is per-metric data max, not global") {
    val anchor = 100L * DAY
    val df = seriesDF(
      ("a", anchor, 1.0),
      ("b", anchor - 10 * DAY, 2.0),           // b's own anchor is 10 days earlier
      ("b", anchor - 10 * DAY - 3600, 3.0))
    val rows = TrendOps.bandedExtents(df).collect()
    // metric b must be banded relative to ITS max, so both b samples band 1.
    val b = rows.filter(_.getAs[String]("metric") == "b")
    assert(b.map(_.getAs[Int]("day_bin")).toSet == Set(1))
    assert(b.head.getAs[Long]("slice_len") == 2L)
  }

  test("A2 cumulative variant: trailing windows overlap (bin 3 contains bin 1)") {
    val anchor = 100L * DAY
    val df = seriesDF(
      ("m", anchor, 1.0),               // in bins 1,3,5,7
      ("m", anchor - 2 * DAY, 2.0),     // in bins 3,5,7
      ("m", anchor - 6 * DAY, 3.0))     // in bin 7 only
    val rows = TrendOps.bandedExtentsCumulative(df).collect()
      .map(r => r.getAs[Int]("day_bin") -> r.getAs[Long]("slice_len")).toMap
    assert(rows == Map(1 -> 1L, 3 -> 2L, 5 -> 2L, 7 -> 3L))
    // disjoint flagship on the same data: each sample counted once
    val disjoint = TrendOps.bandedExtents(df).collect()
      .map(r => r.getAs[Int]("day_bin") -> r.getAs[Long]("slice_len")).toMap
    assert(disjoint == Map(1 -> 1L, 3 -> 1L, 7 -> 1L))
  }

  test("A3 completeness: span of exactly 18h is NOT complete; 18h+1s is") {
    val anchor = 100L * DAY
    def spanDf(spanSec: Long) =
      seriesDF(("m", anchor, 1.0), ("m", anchor - spanSec, 2.0))
    def complete(spanSec: Long): Boolean =
      TrendOps.bandedExtents(spanDf(spanSec)).collect()
        .find(_.getAs[Int]("day_bin") == 1).get.getAs[Boolean]("is_complete")
    assert(!complete(18L * 3600))
    assert(complete(18L * 3600 + 1))
  }

  test("F1 faithful (anchored gap) diverges from bucketized on irregular input") {
    // newest-first faithful scan from 119: keep 119, skip 61 (58<=60),
    // skip 59 (60<=60), keep 0 (119>60)  -> {119, 0}
    // minute buckets: {0,59}->59, {61,119}->119 -> {59, 119}
    val df = seriesDF(("m", 0L, 1.0), ("m", 59L, 2.0), ("m", 61L, 3.0), ("m", 119L, 4.0))
    val faithful = TrendOps.decimateFaithful(df, 60.0).collect().map(_.e).toSet
    val bucketized = TrendOps.decimateBucketized(df, 60L).collect()
      .map(_.getAs[Long]("e")).toSet
    assert(faithful == Set(119L, 0L))
    assert(bucketized == Set(59L, 119L))
  }

  test("F1 faithful: every consecutive kept pair per metric has gap > interval") {
    val df = seriesDF((0 until 200).map(i => ("m", i * 13L, i.toDouble)): _*)
    val kept = TrendOps.decimateFaithful(df, 60.0).collect().map(_.e).sorted
    kept.sliding(2).foreach {
      case Array(a, b) => assert(b - a > 60, s"gap $a..$b")
      case _           =>
    }
  }

  test("M3 retention keeps only the horizon behind the per-metric anchor") {
    val anchor = 100L * DAY
    val df = seriesDF(
      ("m", anchor, 1.0), ("m", anchor - 7 * DAY, 2.0), ("m", anchor - 7 * DAY + 1, 3.0))
    val kept = TrendOps.retentionCull(df, 7 * DAY).collect().map(_.getAs[Double]("value")).toSet
    assert(kept == Set(1.0, 3.0)) // boundary sample (strict >) culled
  }

  test("A5 rolling mean uses exactly the newest N; short series uses all (no length-1 quirk)") {
    val df = seriesDF((1 to 5).map(i => ("m", i * 100L, i.toDouble)): _*)
    val r3 = TrendOps.rollingMean(df, 3).collect().head
    assert(r3.getAs[Long]("n_samples") == 3L)
    assert(r3.getAs[Double]("mean_val") == 4.0) // newest 3 = 5,4,3
    val rAll = TrendOps.rollingMean(df, 30).collect().head
    assert(rAll.getAs[Long]("n_samples") == 5L)
    assert(rAll.getAs[Double]("mean_val") == 3.0)
  }

  test("A7 sessionization splits on gap strictly greater than the cutoff") {
    val df = userSeriesDF((1L, 0L), (1L, 1800L), (1L, 3601L), (2L, 0L))
    val rows = TrendOps.sessionize(df, 1800L).collect()
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 2) // 0,1800 in one session (gap == cutoff stays), 3601 starts new
    assert(rows.count(_.getAs[Long]("user_id") == 2L) == 1)
  }

  test("A6 rates count messages and bytes per (metric, minute)") {
    val df = seriesDF(("m", 0L, 1.0), ("m", 59L, 1.0), ("m", 60L, 1.0))
    val rows = TrendOps.rateMetrics(df, 60L).collect()
    assert(rows.length == 2)
    val w0 = rows.find(_.getAs[Long]("w_start") == 0L).get
    assert(w0.getAs[Long]("msgs") == 2L)
    assert(w0.getAs[Double]("msgs_per_sec") == 2.0 / 60.0)
  }

  test("sketch stats: approx distinct within rsd of exact; approx median near exact") {
    val df = Tables.metricSeries(spark, "/root/testdata/sf0.001")
    TrendOps.sketchStats(df).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.15, s"hll off: $approx vs $exact")
      val p50a = r.getAs[Double]("p50_approx")
      val p50e = r.getAs[Double]("p50_exact")
      assert(math.abs(p50a - p50e) / math.max(p50e, 1.0) < 0.1, s"p50 off: $p50a vs $p50e")
    }
  }

  test("window funnel: anchor DP finds chains, window cuts, ties chain") {
    val s = spark
    import s.implicits._
    def funnel(rows: (Long, String, Long)*) =
      TrendOps.windowFunnel(
        rows.toSeq.toDF("user_id", "metric", "e"),
        Seq("a", "b", "c"), windowSeconds = 100L)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // u1 completes in-window; u2's c lands outside the window of its ONLY
    // possible anchor; u3 needs the LATER anchor (DP must upgrade: the
    // first a at 0 would put c at 150 out of window, the second a at 60
    // keeps it in); u4 chains a tie (b at the same second as a)
    val got = funnel(
      (1L, "a", 0L), (1L, "b", 10L), (1L, "c", 20L),
      (2L, "a", 0L), (2L, "b", 10L), (2L, "c", 150L),
      (3L, "a", 0L), (3L, "a", 60L), (3L, "b", 70L), (3L, "c", 150L),
      (4L, "a", 5L), (4L, "b", 5L), (4L, "c", 50L),
      (5L, "b", 1L), (5L, "c", 2L)) // no step-1: reaches nothing
    assert(got == Map(1 -> 4L, 2 -> 4L, 3 -> 3L))
    // out-of-order steps don't chain backwards (c before b)
    val back = funnel((9L, "a", 0L), (9L, "c", 10L), (9L, "b", 20L))
    assert(back == Map(1 -> 1L, 2 -> 1L, 3 -> 0L))
    intercept[IllegalArgumentException] {
      TrendOps.windowFunnel(Seq((1L, "a", 0L)).toDF("user_id", "metric", "e"),
        Seq("a", "a"), 10L)
    }
  }

  test("SCD2 temporal join: half-open intervals, boundary to new version, left keeps gaps") {
    val s = spark
    import s.implicits._
    import graft.operators.RelationalOps
    val fact = Seq(("k", 5L, "early"), ("k", 10L, "boundary"), ("k", 20L, "late"),
      ("k", 99L, "gap")).toDF("fk", "t", "label")
    val dim = Seq(("k", 0L, 10L, "v1"), ("k", 10L, 30L, "v2"))
      .toDF("dk", "valid_from", "valid_to", "tag")
    val inner = RelationalOps.temporalJoin(fact, dim, "fk", "dk", "t")
      .select("label", "tag").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // t=10 is exactly the version cut: half-open assigns the NEW version
    assert(inner == Map("early" -> "v1", "boundary" -> "v2", "late" -> "v2"))
    val left = RelationalOps.temporalJoin(fact, dim, "fk", "dk", "t",
        joinType = "left")
      .select("label", "tag").collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(left("gap").isEmpty && left.size == 4) // uncovered fact kept with null
  }

  test("holt smoothing: level tracks drift where ewma lags; hand values exact") {
    val s = spark
    import s.implicits._
    val df = seriesDF(("m", 0L, 10.0), ("m", 60L, 20.0), ("m", 120L, 30.0))
    val pts = TrendOps.holt(df, alpha = 0.5, beta = 0.5).collect()
      .sortBy(_.e)
    // seed: l=10, b=0; t2: l=0.5*20+0.5*10=15, b=0.5*5+0=2.5;
    // t3: l=0.5*30+0.5*17.5=23.75, b=0.5*8.75+0.5*2.5=5.625
    assert(pts.map(p => (p.level, p.trend)).toSeq ==
      Seq((10.0, 0.0), (15.0, 2.5), (23.75, 5.625)))
    assert(pts.last.forecast == 23.75 + 5.625)
    // on a pure linear ramp the one-step forecast converges to the next
    // value while plain EWMA stays permanently behind it
    val ramp = seriesDF((0 until 50).map(i => ("r", i * 60L, i * 10.0)): _*)
    val h = TrendOps.holt(ramp, 0.5, 0.5).collect().sortBy(_.e)
    val e = TrendOps.ewma(ramp, 0.5).collect().sortBy(_.e)
    val nextVal = 50 * 10.0
    assert(math.abs((h.last.forecast) - nextVal) < 1.0)
    assert(nextVal - e.last.ewma > 15.0) // ewma's structural lag
  }

  test("cohort retention: first-day cohorts, offsets, rates") {
    val s = spark
    import s.implicits._
    // u1 cohort day 0, active days 0,1,3; u2 cohort day 0, active day 0;
    // u3 cohort day 1, active days 1,2 — two events one day dedup to one
    val df = Seq(
      (1L, 10L), (1L, 86400L + 5), (1L, 3 * 86400L + 2),
      (2L, 20L), (2L, 25L),
      (3L, 86400L + 1), (3L, 2 * 86400L)
    ).map { case (u, e) => (u, "m", e, 0.0) }
      .toDF("user_id", "metric", "e", "value")
    val rows = TrendOps.cohortRetention(df, maxOffsetDays = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows == Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),   // u1, u2 on day 0
      (0L, 1L) -> ((1L, 2L, 0.5)),   // u1 back on day 1 (day 3 > cap)
      (1L, 0L) -> ((1L, 1L, 1.0)),   // u3's own cohort
      (1L, 1L) -> ((1L, 1L, 1.0))))  // u3 back on day 2
  }

  test("audience overlap: sketch estimates track the exact matrix") {
    val df = Tables.metricSeries(spark, "/root/testdata/sf0.001")
    val exact = TrendOps.audienceOverlapExact(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val est = TrendOps.audienceOverlapSketch(df).collect()
    assert(est.length == exact.size && est.nonEmpty) // every pair, incl zero-overlap
    est.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (ua, ub, iu, uu) = exact(key)
      // per-sketch HLL rsd at lgK=12 is ~1.6%; union inherits it, and the
      // inclusion-exclusion intersection inherits the SUM of the three —
      // bound each at a loose multiple, absolute floor for tiny overlaps
      assert(math.abs(r.getDouble(2) - ua) / ua < 0.10, s"$key est_a")
      assert(math.abs(r.getDouble(4) - uu) / uu < 0.10, s"$key est_union")
      assert(math.abs(r.getDouble(5) - iu) <= math.max(0.15 * uu, 10.0),
        s"$key est_intersection ${r.getDouble(5)} vs exact $iu")
    }
    // width contract enforced like corrMatrix
    intercept[IllegalArgumentException] {
      TrendOps.audienceOverlapSketch(df, maxMetrics = 1).collect()
    }
    // degenerate pair: all-null user audiences estimate 0 on both sides;
    // jaccard must report 0 (like the exact twin's zero counts), not 0/0 NaN
    val s = spark
    import s.implicits._
    val degen = Seq(("m1", null: java.lang.Long), ("m2", null: java.lang.Long))
      .toDF("metric", "user_id")
    val dr = TrendOps.audienceOverlapSketch(degen).collect()
    assert(dr.length == 1 && dr.head.getDouble(6) == 0.0)
  }

  test("linear resample interpolates gaps between neighbors") {
    // samples at 0s (10.0) and 180s (40.0), step 60 -> 60s and 120s interpolated
    val df = seriesDF(("m", 0L, 10.0), ("m", 180L, 40.0))
    val rows = TrendOps.resampleLinear(df, 60L).collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Double]("interp")).toMap
    assert(rows == Map(0L -> 10.0, 60L -> 20.0, 120L -> 30.0, 180L -> 40.0))
  }

  test("EWMA recurrence seeds at the first sample and decays oldest-to-newest") {
    val df = seriesDF(("m", 0L, 10.0), ("m", 60L, 20.0), ("m", 120L, 30.0))
    val rows = TrendOps.ewma(df, alpha = 0.5).collect().sortBy(_.e)
    assert(rows.map(_.ewma).toSeq == Seq(10.0, 15.0, 22.5))
    assert(rows.map(_.value).toSeq == Seq(10.0, 20.0, 30.0))
  }

  test("chunked EWMA re-anchors each chunk from the combined carry") {
    // span 100s -> e=0,60 land in chunk 0, e=120 in chunk 1. All halves are
    // exact in binary, so chunked equals sequential exactly here.
    val df = seriesDF(("m", 0L, 10.0), ("m", 60L, 20.0), ("m", 120L, 30.0))
    val rows = TrendOps.ewmaChunked(df, alpha = 0.5, chunkSpanSeconds = 100L)
      .collect().sortBy(_.e)
    assert(rows.map(_.ewma).toSeq == Seq(10.0, 15.0, 22.5))
  }

  test("chunked EWMA is bit-identical to sequential when one chunk spans the series") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      (s"m${i % 3}", i.toLong * 37, rnd.nextDouble() * 100)
    }
    val df = seriesDF(rows: _*)
    val seq = TrendOps.ewma(df, alpha = 0.2).collect()
      .map(p => (p.metric, p.e) -> p.ewma).toMap
    val chk = TrendOps.ewmaChunked(df, alpha = 0.2, chunkSpanSeconds = 1000000L)
      .collect()
    assert(chk.length == rows.length)
    chk.foreach(p => assert(seq((p.metric, p.e)) == p.ewma))
  }

  test("chunked EWMA tracks the sequential recurrence to last-ulp tolerance across chunks") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (s"m${i % 3}", i.toLong * 37, rnd.nextDouble() * 100)
    }
    val df = seriesDF(rows: _*)
    val seq = TrendOps.ewma(df, alpha = 0.2).collect()
      .map(p => (p.metric, p.e) -> p.ewma).toMap
    // 500*37s / 1000s span ≈ 19 chunks per metric
    val chk = TrendOps.ewmaChunked(df, alpha = 0.2, chunkSpanSeconds = 1000L)
      .collect()
    assert(chk.length == rows.length)
    chk.foreach { p =>
      val s = seq((p.metric, p.e))
      assert(math.abs(p.ewma - s) <= 1e-9 * math.max(1.0, math.abs(s)),
        s"chunked ${p.ewma} vs sequential $s at (${p.metric}, ${p.e})")
    }
  }

  test("chunked CUSUM and derivative are bit-identical to the sequential forms") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      (s"m${i % 2}", i.toLong * 37, math.floor(rnd.nextDouble() * 10000) / 100)
    }
    val df = seriesDF(rows: _*)
    // ~15 chunks per metric at span 1000s over the 400*37s range
    val cusumSeq = TrendOps.cusum(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Double]("cusum"), r.getAs[Boolean]("breach"))).toMap
    val cusumChk = TrendOps.cusumChunked(df, chunkSpanSeconds = 1000L).collect()
    assert(cusumChk.length == cusumSeq.size)
    cusumChk.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(cusumSeq(k) == (r.getAs[Double]("cusum"), r.getAs[Boolean]("breach")),
        s"cusum mismatch at $k")
    }
    val derSeq = TrendOps.derivative(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Double]("slope")).toMap
    val derChk = TrendOps.derivativeChunked(df, chunkSpanSeconds = 1000L).collect()
    assert(derChk.length == derSeq.size, "chunked derivative must keep every pair")
    derChk.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(derSeq(k) == r.getAs[Double]("slope"), s"slope mismatch at $k")
    }
  }

  test("chunked derivative keeps the cross-gap slope over a skipped chunk index") {
    // span 1000: e=0,500 in chunk 0; e=2500 in chunk 2 — chunk 1 is empty.
    // The (500 -> 2500) pair must survive the decomposition.
    val df = seriesDF(("m", 0L, 10.0), ("m", 500L, 20.0), ("m", 2500L, 30.0))
    val seq = TrendOps.derivative(df).collect()
      .map(r => r.getLong(1) -> r.getAs[Double]("slope")).toMap
    val chk = TrendOps.derivativeChunked(df, chunkSpanSeconds = 1000L).collect()
      .map(r => r.getLong(1) -> r.getAs[Double]("slope")).toMap
    assert(seq.size == 2)
    assert(chk == seq, s"gap pair lost or wrong: chunked $chk vs sequential $seq")
  }

  test("top movers ranks adjacent-day mean deltas and skips gap days") {
    // metric a: day0 mean 10, day1 mean 50 (delta +40)
    // metric b: day0 mean 10, day2 mean 99 — NOT adjacent, no pair
    // metric c: day0 mean 20, day1 mean 15 (delta -5)
    val rows = Seq(
      ("a", 0L, 10.0), ("a", 86400L, 50.0),
      ("b", 0L, 10.0), ("b", 2 * 86400L, 99.0),
      ("c", 0L, 20.0), ("c", 86400L, 15.0))
    val out = TrendOps.topMovers(seriesDF(rows: _*), topK = 10).collect()
    assert(out.length == 2, s"expected a and c pairs only, got ${out.length}")
    assert(out(0).getAs[String]("metric") == "a" && out(0).getAs[Double]("delta") == 40.0)
    assert(out(1).getAs[String]("metric") == "c" && out(1).getAs[Double]("delta") == -5.0)
  }

  test("MAD screen flags masked spikes the 3-sigma screen misses; mad=0 groups are excluded") {
    // 20 base points in [10, 15] plus 3 spikes of 1000: the spikes inflate
    // sigma to ~330 (z ~ 2.6, under the 3-sigma bar) but barely move the
    // median/MAD — the classic masking case the robust screen exists for.
    val base = (0 until 20).map(i => ("m", i.toLong * 60, 10.0 + (i % 6)))
    val spikes = (0 until 3).map(i => ("m", (20 + i).toLong * 60, 1000.0))
    val out = TrendOps.madOutliers(seriesDF(base ++ spikes: _*), k = 3.0).collect()
    assert(out.length == 3, s"expected exactly the 3 spikes, got ${out.length}")
    assert(out.forall(_.getAs[Double]("value") == 1000.0))
    // a constant group (mad = 0) has no robust scale: excluded, not flagged
    val const = (0 until 20).map(i => ("c", i.toLong * 60, 5.0)) :+ ("c", 1200L, 999.0)
    assert(TrendOps.madOutliers(seriesDF(const: _*), k = 3.0).collect().isEmpty)
  }

  test("autocorr: lag-1 of an alternating series is -1, constant series is filtered") {
    // alternating 0,10,0,10… -> lag-1 pairs are perfectly anti-correlated
    val alt = (0 until 40).map(i => ("alt", i.toLong * 60, if (i % 2 == 0) 0.0 else 10.0))
    // constant series -> zero variance -> guarded out before division
    val const = (0 until 40).map(i => ("const", i.toLong * 60, 5.0))
    val out = TrendOps.autocorr(seriesDF(alt ++ const: _*), maxLag = 2).collect()
    val byKey = out.map(r =>
      (r.getAs[String]("metric"), r.getAs[Int]("lag")) -> r.getAs[Double]("acf")).toMap
    assert(math.abs(byKey(("alt", 1)) - (-1.0)) < 1e-12)
    assert(math.abs(byKey(("alt", 2)) - 1.0) < 1e-12)
    assert(!byKey.keySet.exists(_._1 == "const"))
    val n1 = out.find(r => r.getAs[String]("metric") == "alt" && r.getAs[Int]("lag") == 1).get
    assert(n1.getAs[Long]("n_pairs") == 39L)
  }

  test("time-weighted mean weights samples by holding interval") {
    // m: value 10 held for 90s, value 20 held for 10s -> twa = (10*90+20*10)/100 = 11
    val df = seriesDF(("m", 0L, 10.0), ("m", 90L, 20.0), ("m", 100L, 99.0))
    val r = TrendOps.timeWeightedMean(df).collect().head
    assert(r.getAs[Long]("n_intervals") == 2L)
    assert(r.getAs[Double]("total_secs") == 100.0)
    assert(r.getAs[Double]("twa") == 11.0)
  }

  test("resample + forward fill: grid covers the span, gaps carry last observation") {
    // samples at 0s and 130s with step 60 -> grid 0,60,120; 60 and 120 filled from 0s
    val df = seriesDF(("m", 0L, 1.5), ("m", 130L, 9.5))
    val rows = TrendOps.resampleFfill(df, 60L).collect()
      .map(r => r.getAs[Long]("t") -> (Option(r.get(2)), r.getAs[Double]("filled"))).toMap
    assert(rows.keySet == Set(0L, 60L, 120L))
    assert(rows(0L) == (Some(1.5), 1.5))
    assert(rows(60L)._1.isEmpty && rows(60L)._2 == 1.5) // gap forward-filled
    assert(rows(120L) == (Some(9.5), 9.5))              // newest-in-bucket lands on grid
  }

  test("A6 half-full gate drops sparsely-filled windows") {
    // window 0: 2 distinct seconds; window 60: 31 distinct seconds
    val df = seriesDF(
      (Seq(("m", 0L, 1.0), ("m", 59L, 1.0)) ++
        (0 until 31).map(i => ("m", 60L + i, 1.0))): _*)
    val gated = TrendOps.rateMetrics(df, 60L, minFillRatio = 0.5).collect()
    assert(gated.map(_.getAs[Long]("w_start")).toSeq == Seq(60L))
    val ungated = TrendOps.rateMetrics(df, 60L).collect()
    assert(ungated.length == 2)
  }

  test("CUSUM tracks deviation from the metric mean and flags a level shift") {
    // mean = 5: values 4,6,4,6 stay near 0; then a +10 shift accumulates.
    val df = seriesDF(
      ("m", 1L, 4.0), ("m", 2L, 6.0), ("m", 3L, 4.0), ("m", 4L, 6.0),
      ("m", 5L, 15.0), ("m", 6L, 15.0), ("m", 7L, 15.0), ("m", 8L, 15.0))
    // mean = 80/8 = 10; cusum_k = sum(v_i - 10) for i<=k
    val expect = Map(1L -> -6.0, 2L -> -10.0, 3L -> -16.0, 4L -> -20.0,
      5L -> -15.0, 6L -> -10.0, 7L -> -5.0, 8L -> 0.0)
    val rows = TrendOps.cusum(df, threshold = 12.0).collect()
      .map(r => r.getAs[Long]("e") ->
        (r.getAs[Double]("cusum"), r.getAs[Boolean]("breach"))).toMap
    expect.foreach { case (e, c) => assert(rows(e)._1 == c, s"cusum at e=$e") }
    assert(rows.filter(_._2._2).keySet == Set(3L, 4L, 5L)) // |cusum| > 12
  }

  test("HLL tier compose: union of minute sketches estimates EXACTLY like the direct hour sketch") {
    val dir = "/root/testdata/sf0.001"
    val sr = graft.Tables.metricSeries(spark, dir)
    val viaTier = graft.SparkEntry.queries("a26_hll_tier")(spark, dir).collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("bucket_start")) ->
        r.getAs[Long]("approx_users")).toMap
    val direct = sr
      .withColumn("bucket_start", col("e") - (col("e") % 3600))
      .groupBy("metric", "bucket_start")
      .agg(org.apache.spark.sql.functions
        .expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("approx_users"))
      .collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("bucket_start")) ->
        r.getAs[Long]("approx_users")).toMap
    assert(viaTier == direct) // register-wise max is associative: no drift, ever
    assert(viaTier.nonEmpty)
  }

  test("HLL tier streaming twin: replayed minute sketches compose bit-equal to batch a26") {
    val dir = "/root/testdata/sf0.001"
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("bucket_start")) ->
        r.getAs[Long]("approx_users")).toMap
    val streamed = toMap(
      graft.SparkEntry.queries("stream_hll_parity")(spark, dir).collect())
    val batch = toMap(
      graft.SparkEntry.queries("a26_hll_tier")(spark, dir).collect())
    assert(streamed == batch) // union order across micro-batches cannot drift registers
    assert(streamed.nonEmpty)
  }

  test("resample survives a gap far beyond one chunk (bounded per-row arrays)") {
    // 50k steps at 60s spans ~12 chunks of 4096; grid must be complete.
    val gapSteps = 50000L
    val df = seriesDF(("m", 0L, 1.0), ("m", gapSteps * 60L, 2.0))
    val filled = TrendOps.resampleFfill(df, 60L)
    assert(filled.count() == gapSteps + 1)
    val edge = filled.where(col("t") === (gapSteps * 60L - 60L) || col("t") === gapSteps * 60L)
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Double]("filled")).toMap
    assert(edge == Map(gapSteps * 60L - 60L -> 1.0, gapSteps * 60L -> 2.0))
    val lin = TrendOps.resampleLinear(df, 60L)
    assert(lin.count() == gapSteps + 1)
    val mid = lin.where(col("t") === gapSteps * 30L).collect().head.getAs[Double]("interp")
    assert(mid == 1.5) // exact: halfway between 1.0 and 2.0
  }

  test("gap report lists only intervals beyond the threshold") {
    val df = seriesDF(("m", 0L, 1.0), ("m", 100L, 1.0), ("m", 500L, 1.0))
    val gaps = TrendOps.gapReport(df, 300L).collect()
      .map(r => (r.getAs[Long]("gap_start"), r.getAs[Long]("gap_end"), r.getAs[Long]("gap_secs")))
    assert(gaps.toSeq == Seq((100L, 500L, 400L)))
  }

  test("flatline runs find maximal identical-value stretches") {
    val df = seriesDF(
      ("m", 1L, 5.0), ("m", 2L, 5.0), ("m", 3L, 5.0),
      ("m", 4L, 7.0), ("m", 5L, 7.0), ("m", 6L, 9.0))
    val runs = TrendOps.flatlineRuns(df, 2L).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("run_start"),
        r.getAs[Long]("run_end"), r.getAs[Double]("value"))).toSet
    assert(runs == Set((3L, 1L, 3L, 5.0), (2L, 4L, 5L, 7.0)))
  }

  test("LTOB keeps the spike a newest-wins decimation would drop") {
    val df = seriesDF(
      ("m", 2L, 0.0), ("m", 11L, 10.0), ("m", 13L, 0.1),
      ("m", 15L, 0.2), ("m", 22L, 0.0))
    val kept = TrendOps.ltobDownsample(df, 10L).collect().map(_.getAs[Long]("e")).toSet
    assert(kept == Set(2L, 11L, 22L)) // endpoints + the spike at 11, not newest (15)
    val newest = TrendOps.decimateBucketized(df, 10L).collect()
      .map(_.getAs[Long]("bucket_start")).toSet
    assert(newest == Set(0L, 10L, 20L)) // same bucket count, different pick rule
  }

  test("as-of join tolerance nulls matches older than the bound") {
    val s = spark
    import s.implicits._
    val purchases = Seq((1L, 10L, 100L), (2L, 10L, 5000L))
      .toDF("event_id", "user_id", "e")
    val clicks = Seq((9L, 10L, 50L)).toDF("event_id", "user_id", "e")
    def run(tol: Option[Long]) = graft.operators.RelationalOps
      .asOfJoin(purchases, clicks, "user_id", "e", "e", "event_id", tol)
      .select(col("event_id"), col("__asof.event_id").as("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val unbounded = run(None)
    assert(unbounded(1L).contains(9L) && unbounded(2L).contains(9L))
    val bounded = run(Some(1000L))
    assert(bounded(1L).contains(9L) && bounded(2L).isEmpty) // 4950s stale -> no match
  }

  test("OHLC bars pick first/last values with deterministic tie-breaks") {
    val df = seriesDF(
      ("m", 0L, 2.0), ("m", 0L, 1.0),   // tied open timestamp: min value wins
      ("m", 50L, 9.0), ("m", 100L, 3.0),
      ("m", 100L, 4.0),                 // tied close timestamp: max value wins
      ("m", 86400L, 7.0))               // next day's bar
    val bars = TrendOps.ohlcBars(df, 86400L).collect()
      .map(r => r.getAs[Long]("bucket_start") ->
        (r.getAs[Long]("n"), r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"))).toMap
    assert(bars(0L) == ((5L, 1.0, 9.0, 1.0, 4.0)))
    assert(bars(86400L) == ((1L, 7.0, 7.0, 7.0, 7.0)))
  }

  test("corrMatrix enforces its O(m^2) metric cap with a clear error") {
    // 3 metrics sharing buckets: fine under the cap, throws above it.
    val df = seriesDF(
      ("m1", 0L, 1.0), ("m1", 60L, 2.0), ("m2", 0L, 2.0), ("m2", 60L, 5.0),
      ("m3", 0L, 9.0), ("m3", 60L, 1.0))
    assert(TrendOps.corrMatrix(df).count() == 3) // all 3 pairs correlate
    val ex = intercept[IllegalArgumentException] {
      TrendOps.corrMatrix(df, maxMetrics = 2)
    }
    assert(ex.getMessage.contains("O(m^2)") && ex.getMessage.contains("maxMetrics=2"))
  }

  test("pipeline_tokenize: repeated invocations do not grow storage memory") {
    val dir = "/root/testdata/sf0.001"
    def run(): Unit =
      graft.SparkEntry.queries("pipeline_tokenize")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    run()
    val after1 = spark.sparkContext.getPersistentRDDs.size
    run(); run()
    val after3 = spark.sparkContext.getPersistentRDDs.size
    // the one-slot registry frees the previous invocation's blocks: one
    // live persisted copy regardless of how many times the query ran
    assert(after3 <= after1, s"persistent RDDs grew: $after1 -> $after3")
  }
}
