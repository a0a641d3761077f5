package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TrendOps

/** SURVEY §5 property layer: structural invariants over generated series.
  * Uses ScalaCheck generators with explicit seeds (the scalatest-scalacheck
  * bridge artifact isn't in the offline cache, so sampling is driven
  * directly — determinism is a bonus). */
class PropertySpec extends SparkSpec {

  private val DAY = 86400L
  private val seriesGen: Gen[List[(String, Long, Double)]] = for {
    n <- Gen.choose(1, 40)
    base <- Gen.choose(50L * DAY, 200L * DAY)
    rows <- Gen.listOfN(n, for {
      off <- Gen.choose(0L, 9L * DAY)
      v <- Gen.choose(-1000.0, 1000.0)
      m <- Gen.oneOf("a", "b")
    } yield (m, base - off, v))
  } yield rows

  /** Deterministically sample the generator N times and run the check. */
  private def forAll(gen: Gen[List[(String, Long, Double)]], n: Int = 10)(
      check: List[(String, Long, Double)] => Unit): Unit =
    (0 until n).foreach { i =>
      val rows = gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(sys.error("gen failed"))
      withClue(s"seed=${42 + i} rows=$rows: ")(check(rows))
    }

  test("A2: bands partition the retained range; slice lengths sum to retained count") {
    forAll(seriesGen) { rows =>
      val df = seriesDF(rows: _*)
      val extents = TrendOps.bandedExtents(df).collect()
      val anchors = rows.groupBy(_._1).map { case (m, rs) => m -> rs.map(_._2).max }
      // expected retained = samples within 7 days (strict) of their metric anchor
      val retained = rows.count { case (m, e, _) => e > anchors(m) - 7 * DAY }
      assert(extents.map(_.getAs[Long]("slice_len")).sum == retained)
      // every band's extents lie within its boundaries
      extents.foreach { r =>
        val m = r.getAs[String]("metric"); val bin = r.getAs[Int]("day_bin")
        val lo = anchors(m) - bin * DAY
        assert(r.getAs[Long]("first_e") > lo)
        assert(r.getAs[Long]("last_e") <= anchors(m))
      }
    }
  }

  test("A1: argmin/argmax results are members of the input") {
    forAll(seriesGen) { rows =>
      val byMetric = rows.groupBy(_._1)
      TrendOps.argMinMax(seriesDF(rows: _*)).collect().foreach { r =>
        val rs = byMetric(r.getAs[String]("metric"))
        assert(rs.exists(t => t._2 == r.getAs[Long]("min_ts") && t._3 == r.getAs[Double]("min_val")))
        assert(rs.exists(t => t._2 == r.getAs[Long]("max_ts") && t._3 == r.getAs[Double]("max_val")))
        assert(r.getAs[Double]("min_val") == rs.map(_._3).min)
        assert(r.getAs[Double]("max_val") == rs.map(_._3).max)
      }
    }
  }

  test("F1 faithful: kept set is a subset with per-metric gaps > interval") {
    forAll(seriesGen) { rows =>
      val kept = TrendOps.decimateFaithful(seriesDF(rows: _*), 60.0).collect()
      val input = rows.map(t => (t._1, t._2)).toSet
      kept.foreach(s => assert(input.contains((s.metric, s.e))))
      kept.groupBy(_.metric).values.foreach { ks =>
        ks.map(_.e).sorted.sliding(2).foreach {
          case Array(a, b) => assert(b - a > 60)
          case _           =>
        }
      }
    }
  }

  test("A2 cumulative: slice lengths are monotone nondecreasing in bin; largest bin == retained count") {
    forAll(seriesGen) { rows =>
      val byMetric = TrendOps.bandedExtentsCumulative(seriesDF(rows: _*)).collect()
        .groupBy(_.getAs[String]("metric"))
      val anchors = rows.groupBy(_._1).map { case (m, rs) => m -> rs.map(_._2).max }
      byMetric.foreach { case (m, rs) =>
        val byBin = rs.map(r => r.getAs[Int]("day_bin") -> r.getAs[Long]("slice_len"))
          .sortBy(_._1)
        byBin.map(_._2).sliding(2).foreach {
          case Array(a, b) => assert(a <= b, s"$m: ${byBin.toSeq}")
          case _           =>
        }
        val retained = rows.count { case (mm, e, _) => mm == m && e > anchors(m) - 7 * DAY }
        assert(byBin.last._2 == retained)
      }
    }
  }

  test("MinHash: identical texts get identical signatures; signature length is k") {
    forAll(seriesGen, n = 3) { rows =>
      val s = spark
      import s.implicits._
      val text = rows.map(r => s"w${(r._2 % 29)}").mkString(" ")
      val docs = Seq((1L, text), (2L, text), (3L, text + " extra tail words here"))
        .toDF("doc_id", "text")
      val sigs = graft.operators.DedupOps.minHashSignatures(docs, k = 32).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(sigs(1L) == sigs(2L))
      assert(sigs.values.forall(_.length == 32))
    }
  }

  test("TWA lies within [min, max] of the series; total_secs equals the span") {
    forAll(seriesGen) { rows =>
      // need >= 2 samples per metric for an interval to exist
      val byMetric = rows.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      if (byMetric.nonEmpty) {
        val twa = TrendOps.timeWeightedMean(seriesDF(rows: _*)).collect()
          .map(r => r.getAs[String]("metric") ->
            (r.getAs[Double]("twa"), r.getAs[Double]("total_secs"))).toMap
        byMetric.foreach { case (m, rs) =>
          val es = rs.map(_._2)
          val span = (es.max - es.min).toDouble
          val (v, secs) = twa(m)
          assert(secs == span, s"metric $m: total_secs $secs != span $span")
          val vs = rs.map(_._3)
          assert(v >= vs.min - 1e-9 && v <= vs.max + 1e-9,
            s"metric $m: twa $v outside [${vs.min}, ${vs.max}]")
        }
      }
    }
  }

  test("resample: grid step is constant, endpoints bucket-align, ffill never null after first obs") {
    forAll(seriesGen, n = 5) { rows =>
      val out = TrendOps.resampleFfill(seriesDF(rows: _*), 60L).collect()
      out.groupBy(_.getAs[String]("metric")).foreach { case (m, grid) =>
        val ts = grid.map(_.getAs[Long]("t")).sorted
        assert(ts.zip(ts.tail).forall { case (a, b) => b - a == 60L }, s"$m grid not regular")
        val es = rows.filter(_._1 == m).map(_._2)
        assert(ts.head == es.min / 60 * 60 && ts.last == es.max / 60 * 60)
        // after the first observed grid point, filled is never null
        val firstObs = grid.filter(r => !r.isNullAt(2)).map(_.getAs[Long]("t")).min
        assert(grid.filter(_.getAs[Long]("t") >= firstObs).forall(!_.isNullAt(3)))
      }
    }
  }

  test("EWMA output stays within running [min, max]; one row per input") {
    forAll(seriesGen, n = 5) { rows =>
      val out = TrendOps.ewma(seriesDF(rows: _*), alpha = 0.3).collect()
      assert(out.length == rows.length)
      out.groupBy(_.metric).foreach { case (m, pts) =>
        val vs = rows.filter(_._1 == m).map(_._3)
        pts.foreach(p => assert(p.ewma >= vs.min - 1e-9 && p.ewma <= vs.max + 1e-9))
      }
    }
  }

  test("near-dup groups: empty pair list yields empty labels; labels are component minima") {
    val s = spark
    import s.implicits._
    assert(graft.operators.DedupOps.nearDupGroups(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).isEmpty)
    val pairs = Seq((5L, 4L), (4L, 3L), (9L, 8L)).toDF("doc_a", "doc_b")
    val labels = graft.operators.DedupOps.nearDupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.filterKeys(Set(3L, 4L, 5L)).values.toSet == Set(3L))
    assert(labels.filterKeys(Set(8L, 9L)).values.toSet == Set(8L))
  }

  test("M3: retained span per metric never exceeds the horizon") {
    forAll(seriesGen) { rows =>
      TrendOps.retentionCull(seriesDF(rows: _*), 7 * DAY)
        .groupBy("metric")
        .agg(org.apache.spark.sql.functions.expr("max(e) - min(e)").as("span"))
        .collect()
        .foreach(r => assert(r.getAs[Long]("span") < 7 * DAY))
    }
  }

  test("LTOB: one point per occupied bucket, all members of the input, endpoints kept") {
    forAll(seriesGen) { rows =>
      val df = seriesDF(rows: _*)
      val kept = TrendOps.ltobDownsample(df, 3600L).collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("bucket_start"),
          r.getAs[Long]("e"), r.getAs[Double]("value")))
      val buckets = rows.map { case (m, e, _) => (m, e - (e % 3600L)) }.toSet
      assert(kept.map(k => (k._1, k._2)).toSet == buckets) // one row per occupied bucket
      val input = rows.map { case (m, e, v) => (m, e, v) }.toSet
      kept.foreach(k => assert(input.contains((k._1, k._3, k._4)), s"$k not in input"))
      rows.groupBy(_._1).foreach { case (m, rs) =>
        val es = kept.filter(_._1 == m).map(_._3).toSet
        assert(es.contains(rs.map(_._2).min) && es.contains(rs.map(_._2).max),
          s"endpoints of $m not kept")
      }
    }
  }

  test("CUSUM: per-metric final cumulative deviation is exactly zero") {
    forAll(seriesGen) { rows =>
      val out = TrendOps.cusum(seriesDF(rows: _*)).collect()
      assert(out.length == rows.length)
      out.groupBy(_.getAs[String]("metric")).foreach { case (m, rs) =>
        val last = rs.maxBy(r => (r.getAs[Long]("e"), r.getAs[Long]("event_id")))
        assert(last.getAs[Double]("cusum") == 0.0, s"metric $m final cusum")
      }
    }
  }

  test("sequence packing: offsets are contiguous prefix sums within each group") {
    val s = spark
    import s.implicits._
    val docsGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, Gen.choose(1, 12).map(k => ("w " * k).trim))
    } yield rows.zipWithIndex.map { case (t, i) => (i.toLong * 3L, t) } // sparse ids
    (0 until 10).foreach { i =>
      val rows = docsGen.apply(Gen.Parameters.default, Seed(7L + i))
        .getOrElse(sys.error("gen failed"))
      val out = graft.operators.CurationOps
        .packSequences(rows.toDF("doc_id", "text"), capacityTokens = 16L, nGroups = 4)
        .collect()
        .map(r => (r.getAs[Long]("grp"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("start_offset"), r.getAs[Long]("n_tokens")))
      assert(out.length == rows.length)
      out.groupBy(_._1).foreach { case (g, ds) =>
        val ordered = ds.sortBy(_._2)
        var expect = 0L
        ordered.foreach { case (_, id, off, n) =>
          assert(off == expect, s"grp $g doc $id offset")
          expect += n
        }
      }
    }
  }

  test("shuffleShards: a permutation — every doc exactly once, in-shard ranks contiguous from 1") {
    val s = spark
    import s.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val out = graft.operators.CurationOps.shuffleShards(ids, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == (0L until 500L).toSet) // exactly once
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ranks = rows.map(_._3).sorted
      assert(ranks.head == 1L && ranks.last == rows.length.toLong &&
        ranks.distinct.length == rows.length, s"shard $shard ranks not contiguous")
    }
    // seed sensitivity: a different seed must produce a different layout
    val out7 = graft.operators.CurationOps.shuffleShards(ids, nShards = 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out7.toSet != out.toSet)
    // rough balance: no shard more than 2x the ideal share
    assert(out.groupBy(_._2).values.map(_.size).max <= 2 * 500 / 8)
  }

  test("nearDupKeepBy: exactly one representative per component, and it has the max score") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val labels = graft.operators.DedupOps.nearDupGroups(pairs)
    val scores = Seq(1L -> 0.5, 2L -> 0.1, 3L -> 0.4, 5L -> 0.3, 6L -> 0.8, 9L -> 0.0)
      .toDF("doc_id", "score")
    val out = graft.operators.DedupOps.nearDupKeepBy(labels, scores).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    out.groupBy(_._2).foreach { case (label, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"label $label: ${kept.length} representatives")
      assert(kept.head._3 == members.map(_._3).max, s"label $label keeps non-max score")
    }
    assert(out.count(_._4) == 3) // {1,2,3} -> 1 (0.5), {5,6} -> 6 (0.8), {9} -> itself
  }
}
