package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators._

/** Scaling sanity probe: times key operators at 1×/4×/16× the sf input
  * (self-union with id/user offsets so keys stay realistic — 16× sf0.1
  * events ≈ 1.6M rows) and prints the time ratios. A scalable plan grows
  * ≈linearly (ratio ≈ input multiple, modulo fixed overheads); a
  * super-linear ratio flags an operator that would not survive 100 TB.
  *
  * Usage: runMain graft.ScaleProbe [sfDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val base = Tables.metricSeries(spark, sfDir)

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select(
          (col("event_id") + lit(i.toLong * 10_000_000L)).as("event_id"),
          (col("user_id") + lit(i.toLong * 1_000_000L)).as("user_id"),
          col("metric"), col("e"), col("value"), col("props"))
      }.reduce(_ unionByName _)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "a2_banded_extents" -> (df => TrendOps.bandedExtents(df)),
      "f1_decimate" -> (df => TrendOps.decimateBucketized(df, 60L)),
      "a7_sessions" -> (df => TrendOps.sessionize(df, 1800L)),
      "a12_twa" -> (df => TrendOps.timeWeightedMean(df)),
      "a13_resample" -> (df => TrendOps.resampleFfill(df, 60L)),
      "a17_resample_lin" -> (df => TrendOps.resampleLinear(df, 60L)),
      "a20_cusum" -> (df => TrendOps.cusum(df)),
      "a18_ohlc" -> (df => TrendOps.ohlcBars(df)),
      "a16_outliers_shape" -> { df =>
        val v = col("value").cast("decimal(18,2)")
        df.groupBy("metric").agg(sum(v * v).cast("double").as("svv"))
      },
      // Quantile tier at PRODUCTION eps (bounded O(1/eps) summaries, unlike
      // the gate's exactness-regime eps): expect ≈linear — the level-2
      // merge input is one sketch per (metric, minute), not the row stream.
      "a35_quantile_tier" -> { df =>
        val eps = 1e-3
        df.withColumn("minute", floor(col("e") / lit(60.0)).cast("long") * 60)
          .groupBy("metric", "minute")
          .agg(QuantileSketch.summary(col("value"), eps).as("sk"))
          .withColumn("bucket_start", floor(col("minute") / lit(3600.0)).cast("long") * 3600)
          .groupBy("metric", "bucket_start")
          .agg(QuantileSketch.merged(col("sk"), eps).as("sk"))
      },
      // Round-11 analytics: per-user work is constant, user count grows
      // with k — expect ≈linear for the funnel DP and cohort day-sets,
      // flat-ish for the sketch overlap (m stays 5; only the fact pass
      // grows). The validation probe is the one-scan row-rule fold.
      "funnel_steps" -> (df =>
        TrendOps.windowFunnel(df, Seq("view", "click", "purchase"), 600L)),
      "cohort_retention" -> (df => TrendOps.cohortRetention(df, 30)),
      "audience_overlap" -> (df =>
        TrendOps.audienceOverlapSketch(df, maxMetrics = 0)),
      "expectations_fold" -> { df =>
        import graft.operators.ValidationOps._
        graft.operators.ValidationOps.validate(df, Seq(
          NotNull("value"), InRange("value", 0.0, 50.0),
          InSet("metric", Seq("view", "click")), MatchesRegex("metric", "[a-z]+")))
      })

    // Optional comma-list filter (SPARK_GRAFT_PROBE_ONLY) so a new
    // operator's probe can run alone instead of re-timing the whole suite.
    val probeOnly = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    def probe(name: String, mk: Int => DataFrame): Unit = {
      if (!probeOnly.forall(_.contains(name))) return
      val times = Seq(1, 4, 16).map { k =>
        mk(k).write.format("noop").mode("overwrite").save() // warm plan/codegen
        time(mk(k))
      }
      val r4 = times(1) / times(0)
      val r16 = times(2) / times(0)
      println(f"[scale] $name%-20s 1x=${times(0)}%6.2fs 4x=${times(1)}%6.2fs " +
        f"16x=${times(2)}%6.2fs ratios ${r4}%4.1f / ${r16}%5.1f (linear would be 4/16)")
    }

    for ((name, op) <- ops) probe(name, k => op(scaled(k)))

    // Document-side operators (text/curation path). Replica texts get a
    // per-replica suffix token so the 4×/16× corpora are not pure
    // duplicates (pure dup corpora would legitimately grow near-dup
    // candidate pairs quadratically and say nothing about plan scaling).
    val docsBase = Tables.documents(spark, sfDir)
    def scaledDocs(k: Int): DataFrame =
      (0 until k).map { i =>
        docsBase.select(
          (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
          concat(col("text"), lit(s" replica$i")).as("text"),
          col("lang"), col("source"),
          // recomputed so the column stays consistent with the suffixed
          // text for any future weight/quality probe
          length(concat(col("text"), lit(s" replica$i"))).as("n_chars"))
      }.reduce(_ unionByName _)

    val docOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "pack_sequences" -> (df => CurationOps.packSequences(df)),
      "text_tfidf" -> (df => SearchOps.tfidfTopTerms(df)),
      "minhash_signatures" -> (df => DedupOps.minHashSignatures(df, 64)),
      "strip_dup_spans" -> (df => CurationOps.stripDupSpans(df.select("doc_id", "text"))))

    for ((name, op) <- docOps) probe(name, k => op(scaledDocs(k)))

    // Round-6 additions (round-6 VERDICT item 8): the kmeans-refined IVF,
    // the connected-components grouping, and the streaming file replay.

    // Embedding side: each replica applies a DETERMINISTIC PER-REPLICA
    // SIGN-FLIP pattern across coordinates — norms are preserved, but the
    // flipped directions are uncorrelated with the base, so replicas land
    // in independent LSH buckets / IVF lists. The earlier one-coordinate
    // epsilon perturbation was NOT enough: hyperplane buckets almost never
    // moved, so 16 near-identical copies stacked into every bucket and the
    // cand-pairs probe measured the pure-dup quadratic blowup (16× ratio
    // ~44) instead of plan scaling — the same decorrelation reasoning as
    // the doc replicas' token suffixes, found in round 10's probe run.
    val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    def scaledEmb(k: Int): DataFrame =
      (0 until k).map { i =>
        embBase.select(
          (col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
          transform(col("embedding"),
            (x, j) => when(pmod(hash(lit(i), j), lit(2)) === 0, x).otherwise(-x))
            .as("embedding"))
      }.reduce(_ unionByName _)
    probe("ivf_topk_refined", { k =>
      val emb = scaledEmb(k)
      SimilarityOps.ivfTopK(emb.where(col("vec_id") < 8), emb, 5,
        nlist = 32, nprobe = 8, refineIters = 2)
    })

    // CC over an edge list derived from the scaled corpus: chains of 10
    // docs (diameter ~10, constant across scales — replica offsets keep
    // chains disjoint), so the ratio isolates the per-round shuffle cost
    // growth rather than a varying round count.
    probe("neardup_cc", { k =>
      val edges = scaledDocs(k).select(col("doc_id").as("doc_a"),
          (col("doc_id") + 1).as("doc_b"))
        .where(col("doc_id") % 10 =!= 9)
      DedupOps.nearDupGroups(edges)
    })

    // Streaming replay: fixed slice count, scaled input — at real scale
    // each micro-batch is incremental, so the expectation is the
    // aggregation cost scaling linearly on top of the engine's fixed
    // per-batch overhead (checkpoint fsyncs, state-store commits).
    probe("stream_replay", k =>
      graft.streaming.StreamReplay.minuteTierReplay(scaled(k), slices = 3))

    // Round-9 additions: the sharded shuffle layout (map-side shard +
    // per-shard rank — expect linear) and the batch leg of the embedding
    // near-dup gate (bucket self-join behind ReusedExchange — candidate
    // growth tracks planted-twin density, so with perturbed replicas the
    // ratio should stay near-linear, not quadratic).
    probe("shuffle_shards", k =>
      CurationOps.shuffleShards(scaledDocs(k).select("doc_id"), nShards = 8))
    // At FIXED bucket granularity the all-pairs candidate generator is
    // structurally O(n²/2^bits): occupancy per bucket grows with n, pairs
    // per bucket quadratically (measured 41× at 16× with bits pinned to
    // 8 — decorrelating the replicas does not change it). The documented
    // 100 TB posture is that granularity is a PARAMETER that grows with
    // the corpus (exactly like IVF's nlist): +2 bits per 4× keeps bucket
    // occupancy constant, and the probe holds ≈linear.
    probe("emb_cand_pairs", { k =>
      val bits = 8 + (31 - Integer.numberOfLeadingZeros(k)) // 8 + log2(k)
      SimilarityOps.embeddingCandidatePairs(scaledEmb(k), bitsPerTable = bits)
    })

    // Round-11 additions: PQ train+encode (ScaleUp keeps embeddings as a
    // fixed dimension table, so the scaled self-union here is PQ's only
    // with-scale evidence) and the trained quality scorer. Both should hold
    // ≈linear: PQ's round is one map-only assignment + one model-sized
    // aggregate, encode is pure map; the scorer is `iters` map-side-combined
    // gradient aggregates (model-sized collects) + a map-only scoring pass.
    probe("pq_train_encode", { rep =>
      val emb = scaledEmb(rep)
      SimilarityOps.pqEncodeLong(emb,
        SimilarityOps.pqTrain(emb, m = 8, k = 16, updates = 1))
    })
    probe("quality_train_score", { rep =>
      val docs = scaledDocs(rep)
      QualityModel.score(docs, QualityModel.trainLogistic(docs))
    })
    // Bigram LM: two explode-aggregates + two equi-joins — expect ≈linear
    // (the count tables grow sub-linearly; replica-suffixed docs keep the
    // vocabulary from being a pure 16× duplicate).
    probe("text_bigram_lm", rep => SearchOps.bigramLmScores(scaledDocs(rep)))

    // BPE training: the corpus only funds ONE word-frequency pass; every
    // merge iteration runs on the CAPPED vocab table regardless of scale
    // — expect strongly sub-linear (iteration count and per-iteration
    // size both fixed; only the first pass grows).
    probe("bpe_train", rep =>
      graft.operators.BpeOps.train(scaledDocs(rep), numMerges = 12,
        vocabCap = 800))
    // Fuzzy matching: replica tags on BOTH ends decorrelate the blocking
    // keys across replicas (otherwise identical suffixes stack 16 replicas
    // into one block and the probe measures the documented
    // fixed-granularity quadratic, as emb_cand_pairs already does).
    probe("fuzzy_title_pairs", { rep =>
      val titles = scaledDocs(rep).select(col("doc_id").as("id"),
        concat_ws(" ",
          (col("doc_id") / lit(10_000_000L)).cast("long").cast("string"),
          array_join(slice(TextOps.tokens(col("text")), 1, 4), " "),
          (col("doc_id") / lit(10_000_000L)).cast("long").cast("string")).as("s"))
      DedupOps.fuzzySelfPairs(titles, maxDist = 2, blockLen = 4)
    })
    // PageRank: 4 rounds over 10-chains + hub edges (out-degree ≈ 2,
    // constant round count) — expect ≈linear per-round join/agg growth.
    probe("graph_pagerank", { rep =>
      val ids = scaledDocs(rep).select(col("doc_id"))
      val chain = ids.where(col("doc_id") % 10 =!= 9)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val hub = ids.select(col("doc_id").as("src"),
        (col("doc_id") - pmod(col("doc_id"), lit(10L))).as("dst"))
      GraphOps.pageRank(chain.unionByName(hub), iters = 4)
    })
    // IVF-PQ train + full retrieval at fixed nlist: probed fraction stays
    // nprobe/nlist, so scoring work tracks corpus size — expect ≈linear.
    probe("ann_topk_ivfpq", { rep =>
      val emb = scaledEmb(rep)
      val model = SimilarityOps.ivfPqTrain(emb, nlist = 8, m = 8, pqK = 16)
      SimilarityOps.ivfPqTopK(emb.where(col("vec_id") < 8), emb, model,
        k = 5, nprobe = 3)
    })

    // Hot-metric skew posture (round-8 VERDICT item 8): the sequential
    // recurrences' documented worst case — EVERY row on ONE metric, so
    // max parallelism is 1 and the whole series is a single external
    // sort + linear scan task. The expectation here is ratios that stay
    // ≈linear in input size WITHOUT the multi-core speedup the spread
    // fixtures enjoy — time ∝ rows on one core is the contract, and the
    // documented escape hatches are decimateBucketized (parallel) and the
    // streaming twins (incremental, O(1) state). A super-linear ratio
    // would instead flag an accidental O(n²) in the scan itself.
    def oneHotMetric(k: Int): DataFrame =
      scaled(k).withColumn("metric", lit("hot"))
    probe("decimate_faithful_hot", k =>
      TrendOps.decimateFaithful(oneHotMetric(k), 60.0).toDF())
    probe("ewma_hot", k =>
      TrendOps.ewma(oneHotMetric(k), alpha = 0.2).toDF())
    // The round-9 batch escape hatch for that worst case: the time-chunked
    // EWMA splits the hot metric's timeline into day chunks (parallel
    // in-chunk folds + a summary-sized carry combine), so unlike ewma_hot
    // this probe SHOULD show the multi-core speedup of the spread fixtures.
    probe("ewma_chunked_hot", k =>
      TrendOps.ewmaChunked(oneHotMetric(k), alpha = 0.2).toDF())
    probe("cusum_chunked_hot", k => TrendOps.cusumChunked(oneHotMetric(k)))
    probe("derivative_chunked_hot", k => TrendOps.derivativeChunked(oneHotMetric(k)))

    // Skew-join posture (round-9 VERDICT item 2): salted vs plain shuffle
    // join on a fixture where ~90% of the big side collapses onto ONE key
    // (the gate's q_skew_join shape). Broadcast and AQE's skew-join split
    // are disabled INSIDE this block only, to isolate what manual salting
    // buys in exactly the regime it exists for — small side too big to
    // broadcast, strategy outside AQE's reach. Plain SMJ puts the hot
    // key's entire sort+merge in one task (so the 16× ratio degrades
    // toward single-core time); salting spreads it over 16 sub-keys and
    // should hold the multi-core ratio. Row-for-row equality of the two
    // paths is pinned by the gate row + DedupSimilaritySpec.
    {
      def sk(c: Column) = when(pmod(c, lit(100L)) < 90, lit(0L))
        .otherwise(pmod(c, lit(100L))).as("sk")
      val o = Tables.orders(spark, sfDir)
      def skewedOrders(k: Int): DataFrame =
        (0 until k).map { i =>
          o.select((col("o_orderkey") + lit(i.toLong * 10_000_000L))
              .as("o_orderkey"),
            col("o_totalprice"), sk(col("o_custkey")))
        }.reduce(_ unionByName _)
      val dim = Tables.customer(spark, sfDir)
        .select(sk(col("c_custkey")))
        .groupBy("sk").agg(count(lit(1)).as("dim_customers"))
      def aggAfter(j: DataFrame): DataFrame =
        j.groupBy("sk").agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val conf = spark.conf
      val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevSkew = conf.get("spark.sql.adaptive.skewJoin.enabled")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try {
        probe("skew_join_plain", k => aggAfter(skewedOrders(k).join(dim, "sk")))
        probe("skew_join_salted", k =>
          aggAfter(RelationalOps.saltedJoin(skewedOrders(k), dim, "sk", 16)))
      } finally {
        conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
        conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
      }
    }

    // a34 heavy-hitters: the point of the sketch is SHUFFLE VOLUME, not
    // wall time at toy scale — each task ships one O(cap) summary instead
    // of one row per distinct term. Measure actual shuffle-write bytes of
    // the exact top-terms aggregation vs the MG sketch on the 16× corpus
    // via a stage-metrics listener (listener delivery is async; the short
    // sleep after each job lets the bus drain before reading the counter).
    {
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      def measure(df: => DataFrame): (Double, Long) = {
        Thread.sleep(500); shuffleBytes.set(0L)
        val t = time(df)
        Thread.sleep(500)
        (t, shuffleBytes.get())
      }
      val terms16 = scaledDocs(16)
        .select(col("lang"), explode(graft.operators.TextOps.tokens(col("text"))).as("term"))
      def exactTop(): DataFrame =
        RelationalOps.topNPerGroup(
          terms16.groupBy("lang", "term").agg(count(lit(1)).as("f")),
          20, Seq(lit(1)), Seq(col("f").desc, col("term").asc))
      def sketchTop(): DataFrame =
        terms16.groupBy("lang")
          .agg(HeavyHitters.summary(col("term"), cap = 256).as("sk"))
          .agg(HeavyHitters.merged(col("sk"), cap = 256).as("sk"))
          .select(explode(col("sk")).as("t"))
      val (te, be) = measure(exactTop())
      val (ts, bs) = measure(sketchTop())
      println(f"[scale] topk_exact_16x      time=$te%6.2fs shuffle=${be}%d B")
      println(f"[scale] topk_sketch_16x     time=$ts%6.2fs shuffle=${bs}%d B " +
        f"(sketch/exact shuffle ratio ${bs.toDouble / math.max(1L, be)}%.3f)")
      spark.sparkContext.removeSparkListener(listener)
    }

    // Bloom-pre-filter posture: what riding the dim's key set to the fact
    // scan buys in the regime the operator exists for — a SHUFFLED join
    // (broadcast disabled inside this block; at 100 TB the dim is too big
    // to broadcast while its key set still fits a bloom filter).
    // Non-matching fact rows die at the scan, so the fact side of the
    // exchange shrinks to the matching ~3% (+ false positives); result
    // equality with the plain join is pinned by the gate row +
    // DedupSimilaritySpec.
    {
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      def measure(df: => DataFrame): (Double, Long) = {
        Thread.sleep(500); shuffleBytes.set(0L)
        val t = time(df)
        Thread.sleep(500)
        (t, shuffleBytes.get())
      }
      val li = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_extendedprice")
      def fact(k: Int): DataFrame =
        (0 until k).map { i =>
          li.select((col("l_orderkey") + lit(i.toLong * 100_000_000L))
              .as("l_orderkey"),
            col("l_partkey"), col("l_extendedprice"))
        }.reduce(_ unionByName _)
      val dim = Tables.part(spark, sfDir).where(col("p_brand") === "Brand#13")
        .select("p_partkey", "p_brand")
      def aggAfter(j: DataFrame): DataFrame =
        j.groupBy("p_brand").agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
      val conf = spark.conf
      val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val (tp, bp) = measure(aggAfter(
          fact(16).join(dim, col("l_partkey") === col("p_partkey"))))
        val (tb, bb) = measure(aggAfter(
          RelationalOps.bloomFilteredJoin(fact(16), dim,
            "l_partkey", "p_partkey")))
        println(f"[scale] bloom_join_plain_16x   time=$tp%6.2fs shuffle=${bp}%d B")
        println(f"[scale] bloom_join_bloomed_16x time=$tb%6.2fs shuffle=${bb}%d B " +
          f"(bloomed/plain shuffle ratio ${bb.toDouble / math.max(1L, bp)}%.3f)")
      } finally {
        conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      }
      spark.sparkContext.removeSparkListener(listener)
    }

    // IVM flat-refresh proof: the rollup view's refresh cost must track
    // the DELTA, not the standing table — build stores whose history is
    // 1x / 4x / 16x the base series (fully refreshed), then time ONE more
    // refresh of an identical fixed-size delta against each. A flat line
    // across the three is the O(delta) claim measured, the difference
    // between a nightly full recompute and a minutes-long delta pass at
    // 100 TB. (Runs only under PROBE_ONLY=ivm_refresh: the fixture writes
    // real parquet stores, heavier than the noop-sink probes above.)
    if (probeOnly.exists(_.contains("ivm_refresh"))) {
      import graft.sources.{RollupView, SnapshotStore}
      val delta = base.select("metric", "e", "value")
        .where(col("event_id") % 10 === 0).localCheckpoint(true)
      val times = Seq(1, 4, 16).map { k =>
        val root = java.nio.file.Files.createTempDirectory(s"ivmp$k").toString
        val src = s"$root/src"; val view = s"$root/view"
        try {
          (0 until k).foreach { i =>
            SnapshotStore.append(
              scaled(1).select("metric",  "e", "value")
                .withColumn("e", col("e") + lit(i.toLong)), src)
            RollupView.refresh(spark, src, view)
          }
          SnapshotStore.append(delta, src)
          val t0 = System.nanoTime()
          RollupView.refresh(spark, src, view)
          (System.nanoTime() - t0) / 1e9
        } finally SnapshotStore.deleteTree(root)
      }
      println(f"[scale] ivm_refresh_fixed_delta table=1x ${times(0)}%5.2fs " +
        f"4x ${times(1)}%5.2fs 16x ${times(2)}%5.2fs " +
        f"(flat = O(delta) holds; ratio16 ${times(2) / times(0)}%4.2f)")
    }

    // IVF append O(delta) proof: the occupancy sidecar makes the append
    // path independent of standing index size — build saved indexes over
    // 1x/4x/16x the embedding corpus, then time ONE append of an
    // identical fixed-size delta against each. Flat = O(delta) holds
    // (a sidecar-less append re-scans the whole lists relation for its
    // skew accounting and would grow ~16x across the legs).
    // Opt-in: SPARK_GRAFT_PROBE_ONLY=ivf_append_radius.
    if (probeOnly.exists(_.contains("ivf_append_radius"))) {
      import graft.operators.SimilarityOps
      val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      def scaledEmb(k: Int): DataFrame =
        (0 until k).map(i => emb.select(
          (col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
          col("embedding"))).reduce(_ unionByName _)
      val delta = emb.limit(500)
        .select((col("vec_id") + lit(900_000_000L)).as("vec_id"),
          col("embedding"))
        .localCheckpoint(true)
      val legs = Seq(1, 4, 16).map { k =>
        val dir = java.nio.file.Files.createTempDirectory(s"ivfapp$k").toString
        try {
          SimilarityOps.saveIvfIndex(
            SimilarityOps.buildIvfIndex(scaledEmb(k), nlist = 64,
              refineIters = 1), dir)
          val t0 = System.nanoTime()
          val retrained = SimilarityOps.appendIvfIndex(spark, dir, delta)
          val t = (System.nanoTime() - t0) / 1e9
          require(!retrained, "distribution-following delta must not re-train")
          t
        } finally graft.sources.SnapshotStore.deleteTree(dir)
      }
      println(f"[scale] ivf_append_fixed_delta index=1x ${legs(0)}%5.2fs " +
        f"4x ${legs(1)}%5.2fs 16x ${legs(2)}%5.2fs " +
        f"(flat = O(delta) holds; ratio16 ${legs(2) / legs(0)}%4.2f)")
    }

    // Snapshot file-skipping at many-file scale: a 10k-file stats-carrying
    // version, then a narrow range read. Checks (a) the distributed
    // stats-join planner stays fast when the per-file stats relation is
    // 10k rows (nothing driver-resident but the selected paths), and
    // (b) pruning actually selects ~1% of files for a ~1% id range.
    // Opt-in only (10k-task write): SPARK_GRAFT_PROBE_ONLY=snapshot_many_files.
    if (probeOnly.exists(_.contains("snapshot_many_files"))) {
      import graft.sources.SnapshotStore
      val root = java.nio.file.Files.createTempDirectory("snapmany").toString
      try {
        val nFiles = 10000
        val df = spark.range(0, nFiles.toLong * 100)
          .select(col("id"), (col("id") % 97).as("payload"))
          .repartitionByRange(nFiles, col("id"))
        val t0 = System.nanoTime()
        SnapshotStore.appendWithStats(df, root, Seq("id"))
        val tw = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val (sel, tot) = SnapshotStore.planFiles(spark, root, -1, "id", 5000L, 15000L)
        val tp = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val cnt = SnapshotStore.readWhere(spark, root, "id", 5000L, 15000L).count()
        val tr = (System.nanoTime() - t2) / 1e9
        println(f"[scale] snapshot_many_files files=$tot selected=${sel.size} " +
          f"rows=$cnt write=${tw}%6.1fs plan=${tp}%5.2fs read=${tr}%5.2fs")
      } finally SnapshotStore.deleteTree(root)
    }

    // Delete blast-radius probe: a store of K date-keyed appends, then a
    // delete matching rows in exactly ONE directory. Copy-on-write is
    // dir-granular, so the rewrite cost must stay ~flat as K grows (the
    // detection scan is predicate-pushed; untouched dirs carry over by
    // reference). Opt-in: SPARK_GRAFT_PROBE_ONLY=snapshot_delete_radius.
    if (probeOnly.exists(_.contains("snapshot_delete_radius"))) {
      import graft.sources.SnapshotStore
      val legs = Seq(4, 16, 64).map { k =>
        val root = java.nio.file.Files.createTempDirectory(s"delrad$k").toString
        try {
          (0 until k).foreach { d =>
            SnapshotStore.append(
              spark.range(d * 10000L, (d + 1) * 10000L)
                .selectExpr("id", s"$d AS day", "id % 97 AS payload"), root)
          }
          val t0 = System.nanoTime()
          SnapshotStore.deleteWhere(spark, root,
            col("day") === 0 && col("id") % 2 === 0)
          val t = (System.nanoTime() - t0) / 1e9
          val n = SnapshotStore.read(spark, root).count()
          assert(n == k * 10000L - 5000L)
          t
        } finally SnapshotStore.deleteTree(root)
      }
      println(f"[scale] snapshot_delete_radius dirs=4/16/64 " +
        f"${legs(0)}%5.2fs ${legs(1)}%5.2fs ${legs(2)}%5.2fs " +
        f"(flat-ish = rewrite cost tracks the match, not the store; " +
        f"ratio4→64 ${legs(2) / legs(0)}%4.2f vs 16 for proportional)")
    }

    // Retraction-IVM blast radius: a maintained rollup absorbs a delete
    // of half of ONE day while the standing source grows 4→16→64
    // day-keyed directories. The refresh's cost terms are the change
    // diff (one rewritten directory), the dirty-group re-aggregate
    // (day-range pre-filter pushed to the scan, so day-keyed parquet
    // prunes the other days' files) and a view upsert — none O(standing
    // table), so the curve must stay flat-ish while a full rebuild would
    // scale with K. Opt-in: SPARK_GRAFT_PROBE_ONLY=ivm_retract_radius.
    if (probeOnly.exists(_.contains("ivm_retract_radius"))) {
      import graft.sources.{RollupView, SnapshotStore}
      val legs = Seq(4, 16, 64).map { k =>
        val root = java.nio.file.Files.createTempDirectory(s"ivmrad$k").toString
        val src = s"$root/src"; val view = s"$root/view"
        try {
          (0 until k).foreach { d =>
            SnapshotStore.append(
              spark.range(d * 10000L, (d + 1) * 10000L).selectExpr(
                "concat('m', id % 7) AS metric",
                s"$d*86400 + (id % 86400) AS e",
                "CAST(id % 97 AS DOUBLE) AS value"), src)
          }
          RollupView.refresh(spark, src, view)
          SnapshotStore.deleteWhere(spark, src,
            col("e") < 86400L && col("e") % 2 === 0)
          val t0 = System.nanoTime()
          RollupView.refresh(spark, src, view)
          val t = (System.nanoTime() - t0) / 1e9
          // the refresh took the retraction path (ONE atomic keyed
          // replace + append commit), not a rebuild, and the content is right
          val vCur = SnapshotStore.currentVersion(view)
          val kinds = Seq(vCur).flatMap(SnapshotStore.manifestOp(view, _))
          assert(kinds == Seq("upsert"), s"not retraction: $kinds")
          val total = RollupView.read(spark, view)
            .agg(sum(col("cnt"))).head().getLong(0)
          assert(total == k * 10000L - 5000L, s"cnt=$total at k=$k")
          t
        } finally SnapshotStore.deleteTree(root)
      }
      println(f"[scale] ivm_retract_radius dirs=4/16/64 " +
        f"${legs(0)}%5.2fs ${legs(1)}%5.2fs ${legs(2)}%5.2fs " +
        f"(flat-ish = retraction refresh tracks churn + dirty day, " +
        f"not the standing table; ratio4→64 ${legs(2) / legs(0)}%4.2f " +
        f"vs 16 for proportional)")
    }

    // NDV-view refresh radius: the sketch view absorbs ONE fixed-size
    // appended day while the standing source grows 4→16→64 day dirs.
    // The fast path sketches only the delta's manifests (O(delta)) —
    // a refresh that re-sketched the corpus would scale with K. Opt-in:
    // SPARK_GRAFT_PROBE_ONLY=ndv_refresh_radius.
    if (probeOnly.exists(_.contains("ndv_refresh_radius"))) {
      import graft.sources.{NdvView, SnapshotStore}
      val legs = Seq(4, 16, 64).map { k =>
        val root = java.nio.file.Files.createTempDirectory(s"ndvrad$k").toString
        val src = s"$root/src"; val view = s"$root/view"
        try {
          (0 until k).foreach { d =>
            SnapshotStore.append(
              spark.range(d * 10000L, (d + 1) * 10000L).selectExpr(
                "concat('m', id % 7) AS metric",
                s"$d*86400 + (id % 86400) AS e",
                "concat('u', id % 997) AS user_id"), src)
          }
          NdvView.refresh(spark, src, view)
          // the identical delta at every K: one new day, 10k rows
          SnapshotStore.append(
            spark.range(0L, 10000L).selectExpr(
              "concat('m', id % 7) AS metric",
              s"$k*86400 + (id % 86400) AS e",
              "concat('u', id % 997) AS user_id"), src)
          val t0 = System.nanoTime()
          NdvView.refresh(spark, src, view)
          val t = (System.nanoTime() - t0) / 1e9
          // fast append path, and the delta day's estimates are live:
          // each metric's ids stride 7 over 10k rows, so id % 997 covers
          // all 997 residues per metric — truth is 7 × 997, banded 5%
          val vCur = SnapshotStore.currentVersion(view)
          assert(SnapshotStore.manifestOp(view, vCur).contains("append"),
            s"not the O(delta) append path at k=$k")
          val deltaDay = NdvView.read(spark, view)
            .where(col("day") === k).agg(sum(col("approx_users"))).head().getLong(0)
          assert(math.abs(deltaDay - 7L * 997L) <= 0.05 * 7 * 997,
            s"delta-day ndv=$deltaDay at k=$k (truth 6979)")
          t
        } finally SnapshotStore.deleteTree(root)
      }
      println(f"[scale] ndv_refresh_radius dirs=4/16/64 " +
        f"${legs(0)}%5.2fs ${legs(1)}%5.2fs ${legs(2)}%5.2fs " +
        f"(flat-ish = sketch refresh reads only the delta's manifests; " +
        f"ratio4→64 ${legs(2) / legs(0)}%4.2f vs 16 for proportional)")
    }

    // Inverted-index lookup radius: ONE bm25 serve (fixed 500 hit docs,
    // fixed terms) while the indexed corpus grows 1x/4x/16x with FILLER
    // docs whose vocabulary is disjoint from the probe terms. Lookup
    // cost is O(postings of the queried terms) — the hit postings are
    // constant, so the serve must stay flat while a full-scan bm25
    // would track the corpus. Opt-in:
    // SPARK_GRAFT_PROBE_ONLY=search_lookup_radius.
    if (probeOnly.exists(_.contains("search_lookup_radius"))) {
      import graft.sources.{SearchIndex, SnapshotStore}
      val legs = Seq(1, 4, 16).map { k =>
        val root = java.nio.file.Files.createTempDirectory(s"sidxrad$k").toString
        try {
          val hits = spark.range(0L, 500L).selectExpr(
            "id AS doc_id",
            "concat('needle common', id % 5, ' tail', id % 17) AS text")
          val filler = spark.range(0L, k * 40000L).selectExpr(
            "1000000 + id AS doc_id",
            "concat('straw', id % 1000, ' chaff', id % 31, ' dust') AS text")
          SearchIndex.index(spark, hits.unionByName(filler), root, buckets = 16)
          val t0 = System.nanoTime()
          val top = SearchIndex.bm25(spark, root,
            Seq("needle", "common1"), k = 10).collect()
          val t = (System.nanoTime() - t0) / 1e9
          // every returned doc is a hit doc — filler must never score
          assert(top.nonEmpty && top.forall(_.getLong(0) < 500L),
            s"filler docs leaked into the top-k at k=$k")
          t
        } finally SnapshotStore.deleteTree(root)
      }
      println(f"[scale] search_lookup_radius corpus=1x/4x/16x " +
        f"${legs(0)}%5.2fs ${legs(1)}%5.2fs ${legs(2)}%5.2fs " +
        f"(flat = serve reads only the probe terms' bloom-selected " +
        f"posting files; ratio1→16 ${legs(2) / legs(0)}%4.2f vs 16 for " +
        f"corpus-proportional)")
    }

    // Join-view refresh radius: ONE fixed-size left delta (1000 orders,
    // monotone new keys) absorbed while BOTH standing sides grow
    // 1x/4x/16x (stats-carrying appends). The delta path reads the
    // standing right side file-pruned to the delta's key range and
    // bloom-prefilters the surviving rows, so the refresh must stay
    // flat; a naive re-join would track the 16x. Opt-in:
    // SPARK_GRAFT_PROBE_ONLY=join_view_radius.
    if (probeOnly.exists(_.contains("join_view_radius"))) {
      import graft.sources.{JoinView, SnapshotStore}
      val legs = Seq(1, 4, 16).map { k =>
        val root = java.nio.file.Files.createTempDirectory(s"jvrad$k").toString
        val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/V"
        try {
          (0 until k).foreach { i =>
            SnapshotStore.appendWithStats(
              spark.range(i * 50000L, (i + 1) * 50000L).selectExpr(
                "id AS o_id", "concat('c', id % 97) AS cust", "id * 1.0 AS total"),
              l, Seq("o_id"))
            SnapshotStore.appendWithStats(
              spark.range(i * 50000L, (i + 1) * 50000L).selectExpr(
                "id AS lo_id", "1L AS ln", "id * 2.0 AS qty"),
              r, Seq("lo_id"))
          }
          JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
          val base = k * 50000L
          SnapshotStore.appendWithStats(
            spark.range(base, base + 1000L).selectExpr(
              "id AS o_id", "concat('c', id % 97) AS cust", "id * 1.0 AS total"),
            l, Seq("o_id"))
          // the delta's keys have no right match (new range) — the view
          // must not grow, and the refresh must not have re-joined
          val t0 = System.nanoTime()
          JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
          val t = (System.nanoTime() - t0) / 1e9
          assert(JoinView.read(spark, v).count() == k * 50000L,
            s"view grew on a matchless delta at k=$k")
          val vCur = SnapshotStore.currentVersion(v)
          assert(SnapshotStore.manifestOp(v, vCur).contains("append"),
            s"not the O(delta) append path at k=$k")
          t
        } finally SnapshotStore.deleteTree(root)
      }
      println(f"[scale] join_view_radius standing=1x/4x/16x " +
        f"${legs(0)}%5.2fs ${legs(1)}%5.2fs ${legs(2)}%5.2fs " +
        f"(flat = delta refresh file-prunes the standing side to the " +
        f"delta's key range; ratio1→16 ${legs(2) / legs(0)}%4.2f vs 16 " +
        f"for re-join)")
    }

    // LEFT-OUTER join-view refresh radius: ONE fixed-size right delta on
    // already-matched keys absorbed while the view grows 1x/4x/16x. The
    // outer-only cost on top of the inner delta path is the MATCH-ARRIVAL
    // probe (are any of the delta's keys currently null-extended?) — it
    // reads the view file-pruned by the delta's key range through the
    // left-key stats every outer commit stamps, so the refresh must stay
    // flat and stay on the pure-append path; an unpruned probe would
    // track the 16x view scan. Opt-in:
    // SPARK_GRAFT_PROBE_ONLY=join_view_outer_radius.
    if (probeOnly.exists(_.contains("join_view_outer_radius"))) {
      import graft.sources.{JoinView, SnapshotStore}
      val legs = Seq(1, 4, 16).map { k =>
        val root = java.nio.file.Files.createTempDirectory(s"jvorad$k").toString
        val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/V"
        try {
          (0 until k).foreach { i =>
            SnapshotStore.appendWithStats(
              spark.range(i * 50000L, (i + 1) * 50000L).selectExpr(
                "id AS o_id", "concat('c', id % 97) AS cust", "id * 1.0 AS total"),
              l, Seq("o_id"))
            SnapshotStore.appendWithStats(
              spark.range(i * 50000L, (i + 1) * 50000L).selectExpr(
                "id AS lo_id", "1L AS ln", "id * 2.0 AS qty"),
              r, Seq("lo_id"))
          }
          // an unmatched left tail: the view carries REAL null rows, so
          // a lazy implementation can't skip the null bookkeeping
          SnapshotStore.appendWithStats(
            spark.range(10000000L, 10001000L).selectExpr(
              "id AS o_id", "concat('c', id % 97) AS cust", "id * 1.0 AS total"),
            l, Seq("o_id"))
          JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
          // right delta on MATCHED low keys: nothing converts — the
          // refresh must detect that via the pruned probe and append
          SnapshotStore.appendWithStats(
            spark.range(0L, 1000L).selectExpr(
              "id AS lo_id", "99L AS ln", "id * 3.0 AS qty"),
            r, Seq("lo_id"))
          val t0 = System.nanoTime()
          JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
          val t = (System.nanoTime() - t0) / 1e9
          assert(JoinView.read(spark, v).count() == k * 50000L + 2000L,
            s"outer view wrong size after matched-key delta at k=$k")
          val vCur = SnapshotStore.currentVersion(v)
          assert(SnapshotStore.manifestOp(v, vCur).contains("append"),
            s"non-converting right delta left the O(delta) append path at k=$k")
          t
        } finally SnapshotStore.deleteTree(root)
      }
      println(f"[scale] join_view_outer_radius view=1x/4x/16x " +
        f"${legs(0)}%5.2fs ${legs(1)}%5.2fs ${legs(2)}%5.2fs " +
        f"(flat = match-arrival probe file-prunes the view to the " +
        f"delta's key range; ratio1→16 ${legs(2) / legs(0)}%4.2f vs 16 " +
        f"for view-proportional)")
    }

    // FULL-outer join-view refresh radius: fixed-size deltas on BOTH
    // sides (already-matched keys — nothing converts) absorbed while the
    // view grows 1x/4x/16x. Full-outer runs TWO match-arrival probes per
    // refresh (ΔR against null-right rows by left key, ΔL against
    // null-left rows by right key) — both file-pruned through the
    // two-key stats every full-outer commit stamps, so the refresh must
    // stay flat and stay on the pure-append path. Opt-in:
    // SPARK_GRAFT_PROBE_ONLY=join_view_full_radius.
    if (probeOnly.exists(_.contains("join_view_full_radius"))) {
      import graft.sources.{JoinView, SnapshotStore}
      val legs = Seq(1, 4, 16).map { k =>
        val root = java.nio.file.Files.createTempDirectory(s"jvfrad$k").toString
        val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/V"
        try {
          (0 until k).foreach { i =>
            SnapshotStore.appendWithStats(
              spark.range(i * 50000L, (i + 1) * 50000L).selectExpr(
                "id AS o_id", "concat('c', id % 97) AS cust", "id * 1.0 AS total"),
              l, Seq("o_id"))
            SnapshotStore.appendWithStats(
              spark.range(i * 50000L, (i + 1) * 50000L).selectExpr(
                "id AS lo_id", "1L AS ln", "id * 2.0 AS qty"),
              r, Seq("lo_id"))
          }
          // unmatched tails on BOTH sides: the view carries real
          // null-extended rows in both directions
          SnapshotStore.appendWithStats(
            spark.range(10000000L, 10001000L).selectExpr(
              "id AS o_id", "concat('c', id % 97) AS cust", "id * 1.0 AS total"),
            l, Seq("o_id"))
          SnapshotStore.appendWithStats(
            spark.range(20000000L, 20001000L).selectExpr(
              "id AS lo_id", "7L AS ln", "id * 2.0 AS qty"),
            r, Seq("lo_id"))
          JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "full_outer")
          // deltas on MATCHED low keys, both sides in one refresh:
          // neither probe converts — both must detect that file-pruned
          SnapshotStore.appendWithStats(
            spark.range(0L, 1000L).selectExpr(
              "id AS o_id", "concat('d', id % 97) AS cust", "id * 5.0 AS total"),
            l, Seq("o_id"))
          SnapshotStore.appendWithStats(
            spark.range(0L, 1000L).selectExpr(
              "id AS lo_id", "99L AS ln", "id * 3.0 AS qty"),
            r, Seq("lo_id"))
          val t0 = System.nanoTime()
          JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "full_outer")
          val t = (System.nanoTime() - t0) / 1e9
          val vCur = SnapshotStore.currentVersion(v)
          assert(SnapshotStore.manifestOp(v, vCur).contains("append"),
            s"non-converting two-sided delta left the O(delta) append path at k=$k")
          t
        } finally SnapshotStore.deleteTree(root)
      }
      println(f"[scale] join_view_full_radius view=1x/4x/16x " +
        f"${legs(0)}%5.2fs ${legs(1)}%5.2fs ${legs(2)}%5.2fs " +
        f"(flat = BOTH match-arrival probes file-prune the view to the " +
        f"delta key ranges; ratio1→16 ${legs(2) / legs(0)}%4.2f vs 16 " +
        f"for view-proportional)")
    }

    // BPE merge-count probe: wall-time as numMerges grows 32→256→1024 on
    // a FIXED corpus. The pre-rewrite formulation launched one Spark job
    // per merge (time ≈ proportional to merges); the driver-local loop
    // costs one corpus pass + in-memory iterations, so the curve must be
    // near-flat (the 1024 leg may stop early if the capped vocab runs
    // out of pairs — the printed n_rules records that).
    if (!probeOnly.forall(_.contains("bpe_merge_count"))) ()
    else {
      val docs = scaledDocs(1).localCheckpoint(true)
      val legs = Seq(32, 256, 1024).map { m =>
        val t0 = System.nanoTime()
        val n = BpeOps.train(docs, numMerges = m, vocabCap = 800).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[scale] bpe_merge_count 32=${legs(0)._1}%5.2fs " +
        f"256=${legs(1)._1}%5.2fs 1024=${legs(2)._1}%5.2fs " +
        f"n_rules=${legs.map(_._2).mkString("/")} " +
        f"(flat = merge loop is no longer O(merges) Spark jobs; " +
        f"ratio32→1024 ${legs(2)._1 / legs(0)._1}%4.2f)")
    }

    spark.stop()
  }
}
