package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps, TextOps}

class DedupSimilaritySpec extends SparkSpec {

  private def docsDF(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("leakage-safe split: a near-dup cluster never straddles splits") {
    val s = spark
    import s.implicits._
    import graft.operators.CurationOps
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two clusters (0-1-2 chained, 10-11) + singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = DedupOps.nearDupGroups(pairs)
    val split = CurationOps.leakageSafeSplit(docs, labels).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(split.size == 200)
    assert(Set(split(0L), split(1L), split(2L)).size == 1, "cluster 0-1-2 split")
    assert(split(10L) == split(11L), "cluster 10-11 split")
    // both splits are actually populated at this size
    assert(split.values.toSet == Set("train", "eval"))
    // and the content-hash split CANNOT guarantee this: group members get
    // independent assignments there (structural point, not flakiness —
    // the clustered docs here have different texts)
    val naive = CurationOps.withSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(naive.size == 200) // sanity; no cluster guarantee exists
  }

  test("exact dedup groups normalized copies and keeps min doc_id") {
    val docs = docsDF(
      (1L, "the quick  brown fox"),
      (2L, "THE QUICK BROWN   FOX"), // normalizes equal
      (3L, "something else"))
    val groups = DedupOps.exactDedupGroups(docs).collect()
    assert(groups.length == 2)
    val dupGroup = groups.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("rep_doc_id") == 1L)
    assert(DedupOps.exactDedup(docs).count() == 2)
  }

  test("MinHash LSH finds a planted near-dup and no random false pair") {
    val words = (0 until 120).map(i => s"w${i % 37}x$i")
    val base = words.mkString(" ")
    val nearDup = words.dropRight(4).mkString(" ") // high shingle jaccard
    val unrelated = (0 until 120).map(i => s"z$i").mkString(" ")
    val docs = docsDF((1L, base), (2L, nearDup), (3L, unrelated))
    val pairs = DedupOps.nearDupPairs(docs, k = 64, bands = 16, minJaccard = 0.6).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.9)
  }

  test("LSH candidate generation contains no cartesian product in the plan") {
    val docs = docsDF((1L, "a b c d e f"), (2L, "a b c d e g"))
    val plan = DedupOps.minHashCandidates(docs, 16, 4).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("SimHash: identical docs hamming 0; planted variant within 3; blocking finds it") {
    val words = (0 until 200).map(i => s"tok${i % 53}n$i")
    val base = words.mkString(" ")
    val variant = words.dropRight(2).mkString(" ")
    val far = (0 until 200).map(i => s"other$i").mkString(" ")
    val docs = docsDF((1L, base), (2L, variant), (3L, far), (4L, base))
    val pairs = DedupOps.simHashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming")))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 4L && h == 0L })
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 2L })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("jaccardForPairs verifies only the requested candidate pairs") {
    val docs = docsDF((1L, "a b c d e"), (2L, "a b c d f"), (3L, "x y z w q"))
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = DedupOps.jaccardForPairs(pairs, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(out.size == 2)
    assert(out((1L, 2L)) > out((1L, 3L)))
    assert(out((1L, 3L)) == 0.0)
  }

  test("brute-force cosine top-k ranks by true cosine with deterministic ties") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f)),     // query
      (1L, Array(2f, 0f)),     // cos 1.0
      (2L, Array(1f, 1f)),     // cos ~0.707
      (3L, Array(0f, 1f)),     // cos 0
      (4L, Array(-1f, 0f)))    // cos -1
      .toDF("vec_id", "embedding")
    val top = SimilarityOps.bruteTopK(vecs.where(col("vec_id") === 0), vecs, 3)
      .collect().sortBy(_.getAs[Long]("rk"))
    assert(top.map(_.getAs[Long]("c_id")).toSeq == Seq(1L, 2L, 3L))
    assert(top.head.getAs[Double]("score") == 1.0)
  }

  test("LSH top-k scores agree with brute force on shared pairs (real fixture)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where(col("vec_id") < 4)
    val brute = SimilarityOps.bruteTopK(q, emb, 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("c_id")) -> r.getAs[Double]("score")).toMap
    val lsh = SimilarityOps.lshTopK(q, emb, 10).collect()
    assert(lsh.nonEmpty)
    val shared = lsh.flatMap { r =>
      brute.get((r.getLong(0), r.getAs[Long]("c_id"))).map(b => (r.getAs[Double]("score"), b))
    }
    assert(shared.nonEmpty)
    shared.foreach { case (l, b) => assert(l == b) }
    val plan = SimilarityOps.lshTopK(q, emb, 10).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH path must not cross join")
  }

  test("IVF top-k scores agree with brute force on shared pairs; no cartesian") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where(col("vec_id") < 4)
    val brute = SimilarityOps.bruteTopK(q, emb, 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("c_id")) -> r.getAs[Double]("score")).toMap
    val ivf = SimilarityOps.ivfTopK(q, emb, 10, nlist = 16, nprobe = 4).collect()
    assert(ivf.nonEmpty)
    val shared = ivf.flatMap { r =>
      brute.get((r.getLong(0), r.getAs[Long]("c_id"))).map(b => (r.getAs[Double]("score"), b))
    }
    assert(shared.nonEmpty)
    shared.foreach { case (l, b) => assert(l == b) }
    val plan = SimilarityOps.ivfTopK(q, emb, 10).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "IVF path must not cross join")
  }

  test("salted join equals plain join row-for-row") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
    val o = orders.withColumnRenamed("o_custkey", "c_custkey")
    val plain = o.join(customer, "c_custkey")
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    val salted = graft.operators.RelationalOps.saltedJoin(o, customer, "c_custkey", 8)
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("bloom-pre-filtered join equals plain join, even with a tiny (high-FP) filter") {
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val dim = Tables.part(spark, "/root/testdata/sf0.001")
      .where(col("p_brand") === "Brand#13").select("p_partkey", "p_brand")
    val plain = lineitem.join(dim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_partkey").collect().map(_.toSeq).toSet
    val bloomed = graft.operators.RelationalOps
      .bloomFilteredJoin(lineitem, dim, "l_partkey", "p_partkey")
      .select("l_orderkey", "l_partkey").collect().map(_.toSeq).toSet
    assert(bloomed == plain)
    // Deliberately undersized filter (64 bits for dozens of keys): false
    // positives ride through to the join and must be re-verified away.
    val tiny = graft.operators.RelationalOps
      .bloomFilteredJoin(lineitem, dim, "l_partkey", "p_partkey",
        expectedItems = 8L, numBits = 64L)
      .select("l_orderkey", "l_partkey").collect().map(_.toSeq).toSet
    assert(tiny == plain)
  }

  test("bloom pre-filter on an empty build side admits nothing") {
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_partkey", "l_extendedprice")
    val dim = Tables.part(spark, "/root/testdata/sf0.001")
      .where(col("p_brand") === "NO_SUCH_BRAND").select("p_partkey", "p_brand")
    assert(graft.operators.RelationalOps
      .bloomFilteredJoin(lineitem, dim, "l_partkey", "p_partkey").isEmpty)
  }

  test("table profile computes exact per-column stats in one scan") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (2L, None), (3L, Some("a")))
      .toDF("k", "v")
    val prof = graft.operators.RelationalOps.tableProfile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = prof("k"); val v = prof("v")
    assert(k.getAs[Long]("n_rows") == 4L && k.getAs[Long]("n_nonnull") == 4L &&
      k.getAs[Long]("n_distinct") == 3L &&
      k.getAs[String]("min_repr") == "1" && k.getAs[String]("max_repr") == "3")
    assert(v.getAs[Long]("n_nonnull") == 3L && v.getAs[Long]("n_distinct") == 2L &&
      v.getAs[String]("min_repr") == "a" && v.getAs[String]("max_repr") == "b")
    // Scale shape: Expand-free, and each leg's scan prunes to its ONE
    // column (the union's total IO ≈ one wide scan on columnar storage).
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plan = graft.operators.RelationalOps
      .tableProfile(li, Seq("l_orderkey", "l_returnflag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(500))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint>") &&
      plan.contains("ReadSchema: struct<l_returnflag:string>"), plan.take(2000))
  }

  test("approx table profile: one scan, exact counts/min/max, NDV within the HLL bound") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val cols = Seq("l_orderkey", "l_partkey", "l_returnflag")
    val rsd = 0.05
    val approx = graft.operators.RelationalOps.tableProfileApprox(li, cols, rsd)
    // Single-scan shape: no Expand, no join, exactly one parquet scan.
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand") && !plan.contains("Join"), plan.take(500))
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan.take(2000))
    val a = approx.collect().map(r => r.getString(0) -> r).toMap
    val exact = graft.operators.RelationalOps.tableProfile(li, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      // Counts and min/max are exact in both variants; only NDV is a
      // sketch. HLL++ at rsd=5%: allow 4 sigma (plus integer slack for
      // tiny cardinalities, where the sparse path is exact anyway).
      assert(a(c).getAs[Long]("n_rows") == exact(c).getAs[Long]("n_rows"))
      assert(a(c).getAs[Long]("n_nonnull") == exact(c).getAs[Long]("n_nonnull"))
      assert(a(c).getAs[String]("min_repr") == exact(c).getAs[String]("min_repr"))
      assert(a(c).getAs[String]("max_repr") == exact(c).getAs[String]("max_repr"))
      val nd = exact(c).getAs[Long]("n_distinct").toDouble
      val est = a(c).getAs[Long]("n_distinct_approx").toDouble
      assert(math.abs(est - nd) <= math.max(2.0, 4 * rsd * nd),
        s"$c: approx NDV $est vs exact $nd outside 4-sigma")
    }
  }

  test("incremental dedup drops corpus replays and within-batch copies") {
    val corpus = docsDF((1L, "alpha text"), (2L, "beta text"))
    val batch = docsDF(
      (10L, "ALPHA   text"), // normalizes to a corpus dup — must die
      (11L, "gamma text"), // fresh
      (12L, "gamma  TEXT"), // within-batch dup of 11 — must lose to min id
      (13L, "delta text")) // fresh
    val kept = DedupOps.incrementalDedup(batch, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
    // Empty corpus: within-batch dedup only.
    val noCorpus = DedupOps.incrementalDedup(batch, corpus.where(lit(false)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(noCorpus == Set(10L, 11L, 13L))
  }

  test("embedding near-dup finds a planted twin via LSH buckets") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val base = (0 until 20).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val twin = Seq((100L, base.head._2.map(x => x * 1.001f)))
    val vecs = (base ++ twin).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.embeddingNearDupPairs(vecs, minCosine = 0.95).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 100L))
  }

  test("PII redaction scrubs emails and number runs, leaves clean text alone") {
    val s = spark
    import s.implicits._
    val out = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org thanks"),
      (2L, "call +1 (555) 123-4567 today"),
      (3L, "nothing sensitive here 42"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.TextOps.redactPii(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "reach me at <EMAIL> thanks")
    assert(out(2L) == "call <NUM> today")
    assert(out(3L) == "nothing sensitive here 42")
  }

  test("content-hash split is deterministic and roughly 90/10") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = graft.operators.CurationOps.withSplit(docs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = graft.operators.CurationOps.withSplit(docs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // stable across runs
    val total = a.values.sum.toDouble
    assert(a("train") / total > 0.8 && a("train") / total < 0.98)
  }

  test("near-dup groups: min-label propagation finds connected components") {
    val s = spark
    import s.implicits._
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = DedupOps.nearDupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a longer chain converges to the global min within the iteration bound
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val l2 = DedupOps.nearDupGroups(chain).collect().map(_.getLong(1)).toSet
    assert(l2 == Set(1L))
    // non-convergence within maxIters is an error, never silent wrong labels
    val ex = intercept[IllegalStateException] {
      DedupOps.nearDupGroups(chain, maxIters = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("near-dup keep-by-quality: highest score wins, ties to lowest id, singletons keep") {
    val s = spark
    import s.implicits._
    // component {1,2,3} (chain), singleton 9
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val labels = DedupOps.nearDupGroups(pairs)
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (9L, 0.1))
      .toDF("doc_id", "score")
    val kept = DedupOps.nearDupKeepBy(labels, scores).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    // 2 and 3 tie at 0.9 -> lowest id (2) is the representative; 1 drops
    assert(kept == Map(
      1L -> (1L, false), 2L -> (1L, true), 3L -> (1L, false),
      9L -> (9L, true)))
  }

  test("near-dup groups: reliable-checkpoint mode produces identical labels") {
    val s = spark
    import s.implicits._
    val ckDir = java.nio.file.Files.createTempDirectory("graft_cc_ck_").toString
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (3L, 7L)).toDF("doc_a", "doc_b")
    val local = DedupOps.nearDupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = DedupOps.nearDupGroups(pairs, checkpointDir = Some(ckDir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
    assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 10L -> 10L, 11L -> 10L))
    // reliable mode actually wrote checkpoint data to the durable dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "reliable checkpoint mode wrote nothing to the checkpoint dir")
    // and restored the session-global checkpoint dir it had set (the
    // context was unset before the call, so it must be unset after)
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      s"nearDupGroups leaked checkpoint dir ${spark.sparkContext.getCheckpointDir}")
  }

  test("stratified sample is deterministic for a fixed seed and respects strata") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id", "lang")
    def run() = graft.operators.CurationOps
      .stratifiedSample(docs, "lang", Map("en" -> 0.1, "de" -> 0.5), seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(run() == run())
    val sampled = graft.operators.CurationOps
      .stratifiedSample(docs, "lang", Map("en" -> 0.1), seed = 7L)
    assert(sampled.where(col("lang") =!= "en").count() == 0)
  }

  test("text ops: token count, stopword ratio, fingerprints are word-order aware/invariant as designed") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "mat the on sat cat the"), // permutation
      (3L, "entirely different words here"))
      .toDF("doc_id", "text")
    val out = df.select(
      col("doc_id"),
      TextOps.tokenCount(col("text")).as("n"),
      TextOps.bowFingerprint(col("text")).as("bow"),
      TextOps.minShingleFingerprint(col("text")).as("sh")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n") == 6)
    // BOW fingerprint is permutation-invariant; shingle fingerprint is not.
    assert(out(1L).getAs[String]("bow") == out(2L).getAs[String]("bow"))
    assert(out(1L).getAs[String]("bow") != out(3L).getAs[String]("bow"))
    assert(out(1L).getAs[String]("sh") != out(2L).getAs[String]("sh"))
  }

  test("recallAtK: overlap fraction per query, misses report 0 not absent") {
    val s = spark
    import s.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L), (2L, 24L)).toDF("q_id", "c_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 99L), (1L, 98L))
      .toDF("q_id", "c_id") // q2 entirely missed
    val r = SimilarityOps.recallAtK(approx, exact).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 0.6, 2L -> 0.0))
    // candidate pool smaller than k: a perfect index must still score 1.0
    // (denominator is the per-query exact count, not the k parameter)
    val shortExact = Seq((3L, 30L), (3L, 31L), (3L, 32L)).toDF("q_id", "c_id")
    val shortApprox = Seq((3L, 30L), (3L, 31L), (3L, 32L)).toDF("q_id", "c_id")
    val r2 = SimilarityOps.recallAtK(shortApprox, shortExact).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r2 == Map(3L -> 1.0))
  }

  test("ANN recall@5 eval: IVF probing every list recovers brute force exactly") {
    // The fixture embeddings are random, so genuine approximate recall is
    // data-noise (near-orthogonal vectors have no meaningful neighbors) —
    // the eval op's job is to MEASURE that honestly. The sharp assertion:
    // IVF with nprobe = nlist degenerates to exact search → recall 1.0.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.where(col("vec_id") < 8)
    val exact = SimilarityOps.bruteTopK(qs, emb, 5)
    val full = SimilarityOps.ivfTopK(qs, emb, 5, nlist = 8, nprobe = 8)
    val r = SimilarityOps.recallAtK(full, exact).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 8 && r.values.forall(_ == 1.0), s"got $r")
    // the approximate variants report a recall in [0,1] for every query
    for (approx <- Seq(SimilarityOps.lshTopK(qs, emb, 5), SimilarityOps.ivfTopK(qs, emb, 5))) {
      val recalls = SimilarityOps.recallAtK(approx, exact).collect().map(_.getDouble(1))
      assert(recalls.length == 8 && recalls.forall(x => x >= 0.0 && x <= 1.0))
    }
  }

  test("kmeans-refined IVF: recall does not regress vs lowest-id seeds, plan unchanged") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.where(col("vec_id") < 8)
    val exact = SimilarityOps.bruteTopK(qs, emb, 5)
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val r = SimilarityOps.recallAtK(df, exact).collect().map(_.getDouble(1))
      r.sum / r.length
    }
    // Same nlist/nprobe both legs — the comparison isolates the quantizer.
    // (At tiny probe counts over the RANDOM fixture embeddings single-hit
    // noise dominates; 8-of-32 lists is where quantizer quality shows.)
    val seeded = meanRecall(SimilarityOps.ivfTopK(qs, emb, 5, nlist = 32, nprobe = 8))
    val refined = meanRecall(
      SimilarityOps.ivfTopK(qs, emb, 5, nlist = 32, nprobe = 8, refineIters = 2))
    assert(refined >= seeded,
      s"kmeans-refined IVF recall $refined regressed below seeded-IVF $seeded")
    // Refinement balances the inverted lists (the 100 TB property: probe
    // cost is bounded by the largest probed list, so a hoovering centroid
    // is a tail-latency bug, not just a recall bug).
    def minListSize(refineIters: Int): Long = {
      val cents = SimilarityOps.kmeansCentroids(emb, 32, refineIters, spherical = true)
      emb.select(element_at(graft.functions.HashExpressions.topCentroids(
          col("embedding"), cents, 1), 1).as("cid"))
        .groupBy("cid").count().agg(org.apache.spark.sql.functions.min("count"))
        .head().getLong(0)
    }
    assert(minListSize(2) >= minListSize(0),
      "refinement should not worsen the smallest inverted list")
    // refinement only swaps the centroid MODEL: the data-path plan must
    // stay the same list equi-join with no cartesian product
    val plan = SimilarityOps.ivfTopK(qs, emb, 5, refineIters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "refined IVF must not cross join")
  }

  test("bm25: single-term ranking follows tf, termless docs are excluded") {
    val docs = docsDF(
      (1L, "cat cat cat dog"),
      (2L, "cat dog bird fish"),
      (3L, "dog bird fish newt"))
    val out = graft.operators.SearchOps.bm25(docs, Seq("cat"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // ranked, doc 3 absent
    val scores = out.map(_.getDouble(1))
    assert(scores(0) > scores(1) && scores.forall(_ > 0))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("decontaminate flags a train doc sharing an 8-gram with an eval doc") {
    // The split is md5(text) < 'e6' → train. Craft one train and one eval
    // doc sharing exactly one 8-gram, plus an uncontaminated train doc.
    val base = (1 to 8).map(i => s"w$i").mkString(" ")
    def firstWith(prefix: String, train: Boolean): String =
      Iterator.from(0).map(i => s"$base $prefix$i")
        .find(t => (md5hex(t) < "e6") == train).get
    val trainDoc = firstWith("alpha", train = true)
    val evalDoc = firstWith("beta", train = false)
    val cleanTrain = Iterator.from(0).map(i => (1 to 10).map(j => s"x${j}y$i").mkString(" "))
      .find(t => md5hex(t) < "e6").get
    val docs = docsDF((1L, trainDoc), (2L, evalDoc), (3L, cleanTrain))
    val out = graft.operators.CurationOps.decontaminate(docs, n = 8).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("quotaPerGroup keeps exactly k docs per group, selected by content hash") {
    val texts = (0 until 10).map(i => s"doc number $i with its own words")
    val docs = docsDF(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t) }: _*).withColumn("source", (col("doc_id") % 2 === 0).cast("string"))
    val kept = graft.operators.CurationOps
      .quotaPerGroup(docs, "source", k = 3).collect()
    assert(kept.length == 6)
    // survivors are the 3 smallest content hashes per source, not scan order
    val bySource = kept.groupBy(_.getAs[String]("source"))
    for ((_, rows) <- bySource) {
      assert(rows.length == 3)
      val ids = rows.map(_.getAs[Long]("doc_id")).toSet
      val expected = texts.zipWithIndex
        .filter { case (_, i) => rows.head.getAs[String]("source") == (i % 2 == 0).toString }
        .sortBy { case (t, i) => (md5hex(t), i) }.take(3).map(_._2.toLong).toSet
      assert(ids == expected)
    }
  }

  test("sequence packing: running offsets and a chunk-boundary bin step") {
    val docs = docsDF(
      (0L, "a b c d"),        // 4 tokens, starts at 0, bin 0
      (1L, "a b c d e f"),    // 6 tokens, starts at 4, bin 0
      (2L, "x y z"))          // starts at 10 == capacity -> bin 1
    val out = graft.operators.CurationOps.packSequences(docs, capacityTokens = 10L, nGroups = 1)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("grp"), r.getAs[Long]("bin"),
          r.getAs[Long]("start_offset"), r.getAs[Long]("n_tokens"))).toMap
    assert(out(0L) == ((0L, 0L, 0L, 4L)))
    assert(out(1L) == ((0L, 0L, 4L, 6L)))
    assert(out(2L) == ((0L, 1L, 10L, 3L)))
  }

  test("token-window chunking: coverage, overlap, clamped tail, short docs") {
    val docs = docsDF(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10 > window
      (1L, "a b c"),                                  // n=3 < window -> 1 chunk
      (2L, ""))                                       // empty -> 1 empty chunk
    val out = graft.operators.CurationOps
      .chunkDocuments(docs, window = 4, stride = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx")) ->
        (r.getAs[Long]("begin_token"), r.getAs[Long]("n_tokens"),
          r.getAs[String]("chunk_text"))).toMap
    // n=10, w=4, s=3: last index (6+2)/3 = 2 -> starts 0,3,6 all full-width
    assert(out((0L, 0)) == ((0L, 4L, "t1 t2 t3 t4")))
    assert(out((0L, 1)) == ((3L, 4L, "t4 t5 t6 t7")))
    assert(out((0L, 2)) == ((6L, 4L, "t7 t8 t9 t10")))
    // n=11: last start clamps to n-w=7 (not 9) -> tail stays full-width
    val clamped = graft.operators.CurationOps
      .chunkDocuments(docsDF((9L, (1 to 11).map(i => s"t$i").mkString(" "))),
        window = 4, stride = 3)
      .collect().map(r => r.getAs[Long]("begin_token")).sorted
    assert(clamped.toSeq == Seq(0L, 3L, 6L, 7L))
    assert(out((1L, 0)) == ((0L, 3L, "a b c")))
    assert(out((2L, 0)) == ((0L, 0L, "")))
    assert(out.size == 5)
  }

  test("PPS sampling: zero weight never kept, saturated weight always kept, deterministic") {
    val s = spark
    import s.implicits._
    val docs = (1L to 200L).map(i =>
      (i, if (i <= 25) 0 else if (i <= 50) -3000 // negative weight: also never kept
          else if (i <= 100) 10000 else 500))
      .toDF("doc_id", "w")
    def run() = graft.operators.CurationOps
      .ppsSample(docs, "w", refWeight = 4000.0, baseFraction = 0.5, seed = 9L)
      .collect().map(_.getLong(0)).toSet
    val kept = run()
    assert((1L to 50L).forall(!kept.contains(_)), "zero- and negative-weight rows must be dropped")
    assert((51L to 100L).forall(kept.contains), "p>=1 rows must all be kept")
    val mid = (101L to 200L).count(kept.contains)
    assert(mid > 0 && mid < 100, s"mid-weight rows should be partially sampled, got $mid")
    assert(run() == kept)
  }

  test("temperature sampling flattens an oversized group toward sqrt(ref·n), keeps small groups whole") {
    val s = spark
    import s.implicits._
    val docs = ((1L to 400L).map(i => (i, "big")) ++ (401L to 500L).map(i => (i, "small")))
      .toDF("doc_id", "src")
    def run() = graft.operators.CurationOps
      .temperatureSample(docs, groupCol = "src", refCount = 100L, seed = 3L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val kept = run()
    // small group: p = sqrt(100/100) = 1 -> kept unconditionally
    assert((401L to 500L).forall(kept.contains), "at-reference group must survive whole")
    // big group: p = sqrt(100/400) = 0.5 -> ~200 of 400 (coin noise only)
    val big = (1L to 400L).count(kept.contains)
    assert(big > 150 && big < 250, s"expected ~200 kept from the big group, got $big")
    assert(run() == kept, "content-hash coin must be reproducible")
  }

  test("temperature sampling keeps null-group rows (their own group), zero vectors flag as outliers") {
    val s = spark
    import s.implicits._
    val docs = ((1L to 50L).map(i => (i, Option("tagged"))) ++
      (51L to 80L).map(i => (i, Option.empty[String])))
      .toDF("doc_id", "src")
    val kept = graft.operators.CurationOps
      .temperatureSample(docs, groupCol = "src", refCount = 100L, seed = 5L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // both groups are at/below the reference -> p = 1 -> everything kept,
    // INCLUDING the null-group rows a plain equi-join would silently drop
    assert(kept == (1L to 80L).toSet, s"null-group rows lost: ${(1L to 80L).toSet -- kept}")

    // a vector that quantizes to all zeros has NaN cosine -> must be flagged
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(1e-9f, -1e-9f), 0)) // rounds to the zero vector
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.labelDispersion(vecs, outlierBelow = 0.5)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(out(2L), "zero-quantized vector must flag as outlier (NaN cosine)")
    assert(!out(0L) && !out(1L))
  }

  test("packed shards write one partition directory per (group, chunk)") {
    val docs = docsDF(
      (0L, "a b c d"), (1L, "a b c d e f"), (2L, "x y z"))
    val out = java.nio.file.Files.createTempDirectory("packed").toString
    graft.operators.CurationOps.writePackedShards(docs, out, capacityTokens = 10L, nGroups = 1)
    val dirs = new java.io.File(s"$out/grp=0").listFiles().map(_.getName).filter(_.startsWith("bin=")).toSet
    assert(dirs == Set("bin=0", "bin=1"))
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(back.where(col("bin") === 1).select("text").collect().map(_.getString(0)).toSeq == Seq("x y z"))
  }

  test("TF-IDF ranks rare terms above ubiquitous ones per doc") {
    val docs = docsDF(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana"))
    // N=3; df: apple 1, banana 3, cherry 1
    // doc1: apple 2*3/1=6, banana 1*3/3=1; doc2: cherry 3, banana 1
    val rows = graft.operators.SearchOps.tfidfTopTerms(docs, k = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) ->
        (r.getAs[String]("term"), r.getAs[Double]("score"))).toMap
    assert(rows((1L, 1L)) == (("apple", 6.0)))
    assert(rows((1L, 2L)) == (("banana", 1.0)))
    assert(rows((2L, 1L)) == (("cherry", 3.0)))
    assert(rows((3L, 1L)) == (("banana", 1.0)))
  }

  test("k-means separates planted clusters and is run-to-run deterministic") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    def around(c: Array[Float]): Array[Float] =
      c.map(x => x + rng.nextGaussian().toFloat * 0.1f)
    val a = Array(10f, 0f, 0f, 0f)
    val b = Array(0f, 10f, 0f, 0f)
    // vec 0 near a, vec 1 near b (the two deterministic seeds), then mixed.
    val vecs = (Seq(0L -> around(a), 1L -> around(b)) ++
      (2 until 12).map(i => i.toLong -> around(if (i % 2 == 0) a else b)))
      .toDF("vec_id", "embedding")
    def run() = graft.operators.SimilarityOps.kmeansAssign(vecs, nClusters = 2, rounds = 3)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    val got = run()
    val clusterA = got(0L)
    val clusterB = got(1L)
    assert(clusterA != clusterB)
    (2 until 12).foreach { i =>
      assert(got(i.toLong) == (if (i % 2 == 0) clusterA else clusterB), s"vec $i")
    }
    assert(run() == got) // deterministic across runs
  }

  test("stripDupSpans removes exactly the tokens covered by cross-doc 5-grams") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "unique alpha beta gamma delta epsilon zeta one two three"),
      (2L, "prefix alpha beta gamma delta epsilon zeta suffix tail end"),
      (3L, "totally different words with no overlap at all here now"))
      .toDF("doc_id", "text")
    // docs 1 and 2 share the 5-grams at starts 1 and 2 ("alpha..epsilon",
    // "beta..zeta") -> coverage is the UNION of both spans, positions 1..6
    val got = graft.operators.CurationOps.stripDupSpans(docs, 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((10L, 4L, "unique one two three")))
    assert(got(2L) == ((10L, 4L, "prefix suffix tail end")))
    assert(got(3L) == ((10L, 10L,
      "totally different words with no overlap at all here now")))
  }

  test("int8 quantization: codes bounded, reconstruction error <= scale/2, recall holds") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val quant = graft.operators.SimilarityOps.quantizeInt8(emb)
    val rows = quant.collect()
    assert(rows.length == emb.count())
    for (r <- rows) {
      val scale = r.getDouble(1)
      val q = r.getSeq[Long](2)
      assert(q.forall(v => v >= -127 && v <= 127), s"vec ${r.getLong(0)} code out of range")
      assert(scale >= 0)
    }
    // per-element reconstruction error is at most scale/2 (symmetric mid-rise)
    val errOk = quant.join(emb, "vec_id")
      .select(col("vec_id"), col("scale"),
        zip_with(col("q"), graft.operators.SimilarityOps.vecD(col("embedding")),
          (j, x) => abs(j.cast("double") * col("scale") - x) <= col("scale") / 2 + lit(1e-12))
          .as("ok"))
      .select(forall(col("ok"), identity).as("all_ok"))
      .collect().forall(_.getBoolean(0))
    assert(errOk)
    // retrieval over the dequantized index stays close to exact: recall@5 >= 0.8
    val dq = graft.operators.SimilarityOps.dequantizeInt8(quant)
    val exact = graft.operators.SimilarityOps.bruteTopK(
      emb.where(col("vec_id") < 8), emb, 5)
    val approx = graft.operators.SimilarityOps.bruteTopK(
      dq.where(col("vec_id") < 8), dq, 5)
    val recalls = graft.operators.SimilarityOps.recallAtK(approx, exact)
      .collect().map(_.getDouble(1))
    assert(recalls.nonEmpty && recalls.forall(_ >= 0.8),
      s"quantized recall too low: ${recalls.mkString(",")}")
  }

  test("lengthFilter keeps exactly the docs inside the percentile band") {
    val s = spark
    import s.implicits._
    // token counts 1..10: p10 = 1.9, p90 = 9.1 (linear interpolation) ->
    // survivors are counts 2..9
    val docs = (1 to 10).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = graft.operators.CurationOps.lengthFilter(docs, 0.1, 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.keySet == (2L to 9L).toSet)
    assert(kept.forall { case (id, n) => n == id }) // counts reported exactly
  }

  test("stripDupSpans: a short doc duplicated whole-text strips entirely") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "tiny dup"), (2L, "tiny dup"), // < 5 tokens: whole-text shingle
      (3L, "unrelated standalone content here"))
      .toDF("doc_id", "text")
    val got = graft.operators.CurationOps.stripDupSpans(docs, 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((2L, 0L, ""))) // fully stripped
    assert(got(2L) == ((2L, 0L, "")))
    assert(got(3L) == ((4L, 4L, "unrelated standalone content here")))
  }

  test("vocab build ranks by (count desc, token asc); encode maps OOV to -1") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "b a b c b a"),
      (2L, "a c d a"))
      .toDF("doc_id", "text")
    // counts: a=4, b=3, c=2, d=1 -> ids a=0, b=1, c=2; d falls off at maxSize=3
    val vocab = graft.operators.CurationOps.buildVocab(docs, maxSize = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(vocab.toSeq == Seq((0L, "a", 4L), (1L, "b", 3L), (2L, "c", 2L)))
    val vmap = vocab.map(v => v._2 -> v._1).toMap
    val enc = graft.operators.CurationOps.encodeTokens(docs, vmap)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(enc(1L) == Seq(1L, 0L, 1L, 2L, 1L, 0L))
    assert(enc(2L) == Seq(0L, 2L, -1L, 0L)) // d is OOV
  }

  test("LSH index persists: save -> load -> query matches the fused lshTopK exactly") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val qs = emb.where(col("vec_id") < 8)
    val fused = graft.operators.SimilarityOps.lshTopK(qs, emb, 5)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("lsh_index_").toString
    try {
      graft.operators.SimilarityOps.saveLshIndex(
        graft.operators.SimilarityOps.buildLshIndex(emb), dir)
      val loaded = graft.operators.SimilarityOps.loadLshIndex(spark, dir)
      assert((loaded.dim, loaded.tables, loaded.bitsPerTable, loaded.seed) ==
        (64, 8, 8, 42L)) // plane params round-trip -> identical probing
      val served = graft.operators.SimilarityOps.queryLshIndex(loaded, qs, 5)
        .collect().map(_.toString).sorted.toSeq
      assert(served == fused)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("LSH index incremental append: append -> query equals rebuild -> query exactly") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val first = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 =!= 0)
    val qs = emb.where(col("vec_id") < 8)
    // ground truth: one-shot build over the FULL corpus
    val rebuilt = graft.operators.SimilarityOps.lshTopK(qs, emb, 5)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("lsh_inc_").toString
    try {
      graft.operators.SimilarityOps.saveLshIndex(
        graft.operators.SimilarityOps.buildLshIndex(first), dir)
      graft.operators.SimilarityOps.appendLshIndex(spark, dir, rest)
      val served = graft.operators.SimilarityOps.queryLshIndex(
        graft.operators.SimilarityOps.loadLshIndex(spark, dir), qs, 5)
        .collect().map(_.toString).sorted.toSeq
      assert(served == rebuilt) // plane model frozen ⇒ bit-equal results
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("IVF index incremental append: equals assigning the grown corpus under the frozen model") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val first = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 =!= 0)
    val qs = emb.where(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_inc_").toString
    try {
      val built = graft.operators.SimilarityOps
        .buildIvfIndex(first, nlist = 16, refineIters = 2)
      graft.operators.SimilarityOps.saveIvfIndex(built, dir)
      graft.operators.SimilarityOps.appendIvfIndex(spark, dir, rest)
      val served = graft.operators.SimilarityOps.queryIvfIndex(
        graft.operators.SimilarityOps.loadIvfIndex(spark, dir), qs, 5, nprobe = 4)
        .collect().map(_.toString).sorted.toSeq
      // ground truth: the grown corpus assigned under the SAME frozen
      // centroids (a rebuild would refit the quantizer — the documented
      // periodic maintenance, not the append contract)
      val expected = graft.operators.SimilarityOps.queryIvfIndex(
        graft.operators.SimilarityOps.IvfIndex(built.centroids,
          graft.operators.SimilarityOps.assignLists(emb, built.centroids)),
        qs, 5, nprobe = 4)
        .collect().map(_.toString).sorted.toSeq
      assert(served == expected)
      // every appended vector is really in the lists exactly once
      val ids = spark.read.parquet(s"$dir/lists").groupBy("c_id").count().collect()
      assert(ids.forall(_.getLong(1) == 1) && ids.length == emb.count())
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("IVF append drift maintenance: skewed appends re-train, recall@10 does not regress") {
    import graft.operators.SimilarityOps
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 2 === 0)
    val qs = emb.where(col("vec_id") < 8)
    // drifted arrivals: 1000 copies of vec 0's embedding — a single hot
    // direction the trained quantizer never saw at this weight, so they
    // pile into one inverted list (deterministic: no perturbation needed,
    // cosine ignores scale so exact copies are the cleanest drift)
    val v0 = emb.where(col("vec_id") === 0).select(col("embedding"))
    val copies = spark.range(10000, 11000).toDF("vec_id").crossJoin(v0)
    val grownCorpus = base.unionByName(copies)
    val exact = SimilarityOps.bruteTopK(qs, grownCorpus, 10)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      SimilarityOps.recallAtK(approx, exact)
        .agg(avg(col("recall"))).collect().head.getDouble(0)
    val dirFrozen = java.nio.file.Files.createTempDirectory("ivf_frozen_").toString
    val dirDrift = java.nio.file.Files.createTempDirectory("ivf_drift_").toString
    try {
      val built = SimilarityOps.buildIvfIndex(base, nlist = 16, refineIters = 2)
      SimilarityOps.saveIvfIndex(built, dirFrozen)
      SimilarityOps.saveIvfIndex(built, dirDrift)
      // opting out of maintenance keeps the pure frozen-append contract
      assert(!SimilarityOps.appendIvfIndex(spark, dirFrozen, copies,
        retrainSkewFactor = Double.PositiveInfinity))
      // the default hook sees the occupancy spike and re-trains
      assert(SimilarityOps.appendIvfIndex(spark, dirDrift, copies))
      // every vector still indexed exactly once after the re-train swap
      val counts = spark.read.parquet(s"$dirDrift/lists")
        .groupBy("c_id").count().collect()
      assert(counts.forall(_.getLong(1) == 1)
        && counts.length == grownCorpus.count())
      val frozenRecall = meanRecall(SimilarityOps.queryIvfIndex(
        SimilarityOps.loadIvfIndex(spark, dirFrozen), qs, 10, nprobe = 4))
      val retrainedRecall = meanRecall(SimilarityOps.queryIvfIndex(
        SimilarityOps.loadIvfIndex(spark, dirDrift), qs, 10, nprobe = 4))
      // the hook's whole point: adapting the quantizer to the drifted
      // distribution must not lose recall vs serving the stale model
      assert(retrainedRecall >= frozenRecall,
        s"retrained=$retrainedRecall frozen=$frozenRecall")
      assert(retrainedRecall >= 0.5, s"retrained=$retrainedRecall")
    } finally {
      graft.sources.SnapshotStore.deleteTree(dirFrozen)
      graft.sources.SnapshotStore.deleteTree(dirDrift)
    }
  }

  test("IVF drift baseline is train-time: gradual drift cannot ratchet past the trigger") {
    import graft.operators.SimilarityOps
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 2 === 0)
    val v0 = emb.where(col("vec_id") === 0).select(col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_ratchet_").toString
    try {
      SimilarityOps.saveIvfIndex(
        SimilarityOps.buildIvfIndex(base, nlist = 16, refineIters = 2), dir)
      // six SMALL single-direction appends: each step grows skew by well
      // under the 4x factor relative to the PREVIOUS state (the ratchet
      // that would blind a pre-append baseline), but cumulatively they
      // cross 4x the train-time baseline and the hook must fire
      var fired = false
      var steps = 0
      while (!fired && steps < 6) {
        val copies = spark.range(20000 + steps * 1000, 20000 + steps * 1000 + 60)
          .toDF("vec_id").crossJoin(v0)
        fired = SimilarityOps.appendIvfIndex(spark, dir, copies)
        steps += 1
      }
      assert(fired, s"gradual drift never fired in $steps steps")
      // occupancy sidecar stays exact across appends + the re-train swap
      val metaSum = spark.read.parquet(s"$dir/listmeta")
        .agg(sum(col("n"))).collect().head.getLong(0)
      assert(metaSum == spark.read.parquet(s"$dir/lists").count())
    } finally graft.sources.SnapshotStore.deleteTree(dir)
  }

  test("IVF load rejects a torn index (centroids not matching the trained stamp)") {
    import graft.operators.SimilarityOps
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf_torn_").toString
    try {
      SimilarityOps.saveIvfIndex(
        SimilarityOps.buildIvfIndex(emb, nlist = 8, refineIters = 1), dir)
      assert(SimilarityOps.loadIvfIndex(spark, dir).centroids.length == 8)
      // simulate an interrupted retrain swap: the trained stamp names a
      // model the centroids files don't hold
      val s = spark
      import s.implicits._
      val Array((h, sk)) = spark.read.parquet(s"$dir/trainmeta")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      Seq((h + 1, sk)).toDF("model_hash", "train_skew")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/trainmeta")
      val e = intercept[IllegalArgumentException] {
        SimilarityOps.loadIvfIndex(spark, dir)
      }
      assert(e.getMessage.contains("torn"))
    } finally graft.sources.SnapshotStore.deleteTree(dir)
  }

  test("IVF index persists: save -> load -> query matches the fused ivfTopK exactly") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val qs = emb.where(col("vec_id") < 8)
    val fused = graft.operators.SimilarityOps
      .ivfTopK(qs, emb, 5, nlist = 16, nprobe = 4, refineIters = 2)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("ivf_index_").toString
    try {
      val built = graft.operators.SimilarityOps.buildIvfIndex(emb, nlist = 16, refineIters = 2)
      graft.operators.SimilarityOps.saveIvfIndex(built, dir)
      // a fresh index object reading ONLY the persisted files — the
      // serving path: no corpus scan, no kmeans refit at query time
      val loaded = graft.operators.SimilarityOps.loadIvfIndex(spark, dir)
      assert(loaded.centroids.length == built.centroids.length)
      assert(loaded.centroids.zip(built.centroids).forall {
        case (l, b) => l.toSeq == b.toSeq }) // cid order restored exactly
      val served = graft.operators.SimilarityOps.queryIvfIndex(loaded, qs, 5, nprobe = 4)
        .collect().map(_.toString).sorted.toSeq
      assert(served == fused)
      // and a SECOND query batch against the same loaded index (the
      // amortization this API exists for) works without rebuilding
      val more = graft.operators.SimilarityOps.queryIvfIndex(
        loaded, emb.where(col("vec_id") >= 8 && col("vec_id") < 12), 3, nprobe = 4)
      assert(more.groupBy("q_id").count().collect().forall(_.getLong(1) == 3))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("label dispersion flags a planted off-centroid vector") {
    val s = spark
    import s.implicits._
    // label 0: a tight bundle near (1, 0) plus one vector pointing the
    // opposite way; label 1: its own tight bundle (must not mix).
    val vecs = Seq(
      (0L, Array(1.0f, 0.01f), 0),
      (1L, Array(1.0f, -0.01f), 0),
      (2L, Array(0.99f, 0.02f), 0),
      (3L, Array(-1.0f, 0.05f), 0),  // the planted outlier
      (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.01f, 0.98f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.labelDispersion(vecs, outlierBelow = 0.5)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("cos_centroid"), r.getAs[Boolean]("is_outlier"))).toMap
    assert(out.size == 6)
    assert(out(3L)._2, s"planted outlier not flagged: ${out(3L)}")
    for (id <- Seq(0L, 1L, 2L, 4L, 5L))
      assert(!out(id)._2, s"cohesive vector $id misflagged: ${out(id)}")
    // the bundle members sit close to their centroid
    assert(out(0L)._1 > 0.9 && out(4L)._1 > 0.9)
  }

  test("PQ: encode is the explicit argmin-L2; decode concatenates codebook rows; deterministic") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val model = SimilarityOps.pqTrain(emb, m = 8, k = 16, updates = 1)
    assert(model.m == 8 && model.k == 16 && model.subDim == 8)
    val codes = SimilarityOps.pqEncode(emb, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    // replay the encode driver-side with plain argmin ||x - c||^2
    val raw = emb.select(col("vec_id"),
        SimilarityOps.vecD(col("embedding")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for ((id, v) <- raw.take(40); j <- 0 until model.m) {
      val x = v.slice(j * 8, j * 8 + 8)
      val want = (0 until model.k).minBy { c =>
        val cv = model.codebooks(j)(c)
        (x.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }
      assert(codes(id)(j) == want, s"vec $id sub $j")
    }
    // decode = exact concatenation of the selected codebook rows
    val recon = SimilarityOps.pqDecode(SimilarityOps.pqEncode(emb, model), model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for ((id, cs) <- codes.take(20)) {
      val want = cs.zipWithIndex.flatMap { case (c, j) => model.codebooks(j)(c) }
      assert(recon(id).sameElements(want), s"vec $id reconstruction")
    }
    // training is run-to-run deterministic (exact-decimal means, fixed seeds)
    def flat3(a: Array[Array[Array[Double]]]): Seq[Double] =
      a.toSeq.flatMap(_.toSeq.flatMap(_.toSeq))
    val again = SimilarityOps.pqTrain(emb, m = 8, k = 16, updates = 1)
    assert(flat3(model.codebooks) == flat3(again.codebooks))
    // model round-trips through its export relation bit-for-bit
    val back = SimilarityOps.pqModelFromRows(
      SimilarityOps.pqModelToDf(spark, model).collect())
    assert(back.subDim == model.subDim)
    assert(flat3(back.codebooks) == flat3(model.codebooks))
    assert(flat3(back.augmented) == flat3(model.augmented))
  }

  test("PQ retrieval: rerank scores are exact cosines and recall@5 vs brute holds") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val model = SimilarityOps.pqTrain(emb, m = 8, k = 16, updates = 1)
    val queries = emb.where(col("vec_id") < 8)
    val got = SimilarityOps.pqTopK(queries, emb, model, k = 5, rerankFactor = 3)
      .collect()
    assert(got.length == 8 * 5)
    // every emitted score is the TRUE cosine of the pair (the rerank
    // contract) — recompute driver-side
    val raw = emb.select(col("vec_id"),
        SimilarityOps.vecD(col("embedding")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
      while (i < a.length) { xy += a(i) * b(i); xx += a(i) * a(i); yy += b(i) * b(i); i += 1 }
      xy / (math.sqrt(xx) * math.sqrt(yy))
    }
    for (r <- got) {
      val want = cos(raw(r.getAs[Long]("q_id")), raw(r.getAs[Long]("c_id")))
      assert(math.abs(r.getAs[Double]("score") - want) < 1e-12)
    }
    val exact = SimilarityOps.bruteTopK(queries, emb, 5)
    val recalls = SimilarityOps.recallAtK(
      SimilarityOps.pqTopK(queries, emb, model, k = 5, rerankFactor = 3), exact)
      .collect().map(_.getDouble(1))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.4, s"PQ mean recall@5 too low: $mean (${recalls.mkString(",")})")
  }

  test("IVF-PQ: residual reconstruction beats raw PQ, recall holds, codes are index-shaped") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val model = SimilarityOps.ivfPqTrain(emb, nlist = 8, m = 8, pqK = 16)
    val enc = SimilarityOps.ivfPqEncode(emb, model)
    val rows = enc.collect()
    assert(rows.length == emb.count())
    for (r <- rows) {
      assert(r.getInt(1) >= 0 && r.getInt(1) < 8)
      val cs = r.getSeq[Int](2)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
    // mean squared reconstruction error: residual PQ <= raw PQ with the
    // same code budget (the point of quantizing residuals)
    def mse(recon: org.apache.spark.sql.DataFrame): Double =
      recon.select(col("vec_id"), col("embedding").as("rv"))
        .join(emb.select(col("vec_id"), SimilarityOps.vecD(col("embedding")).as("v")), "vec_id")
        .select(aggregate(zip_with(col("v"), col("rv"), (a, b) => (a - b) * (a - b)),
          lit(0d), (acc, x) => acc + x).as("se"))
        .agg(avg("se")).head.getDouble(0)
    val ivfpqMse = mse(SimilarityOps.ivfPqDecode(enc, model)
      .select("vec_id", "embedding"))
    val rawPq = SimilarityOps.pqTrain(emb, m = 8, k = 16, updates = 1)
    val rawMse = mse(SimilarityOps.pqDecode(SimilarityOps.pqEncode(emb, rawPq), rawPq))
    assert(ivfpqMse <= rawMse,
      s"residual PQ mse $ivfpqMse should not exceed raw PQ mse $rawMse")
    // retrieval: full-probe IVF-PQ with exact rerank keeps decent recall
    val queries = emb.where(col("vec_id") < 8)
    val exact = SimilarityOps.bruteTopK(queries, emb, 5)
    val approx = SimilarityOps.ivfPqTopK(queries, emb, model, k = 5,
      nprobe = 8, rerankFactor = 3)
    val recalls = SimilarityOps.recallAtK(approx, exact).collect().map(_.getDouble(1))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.4, s"IVF-PQ mean recall@5 too low: $mean")
  }

  test("fuzzy pairs: substitution caught by suffix block, append by prefix block, far strings dropped") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "alpha beta gamma"),
      (2L, "Xlpha beta gamma"),  // first-char substitution: prefix differs, suffix agrees
      (3L, "alpha beta gammaq"), // appended char: suffix differs, prefix agrees
      (4L, "totally different"), // far from everything
      (5L, "alpha beta gamma"))  // exact duplicate of 1
      .toDF("id", "s")
    val got = graft.operators.DedupOps.fuzzySelfPairs(rows, maxDist = 2, blockLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.get((1L, 2L)).contains(1), s"substitution pair missing: $got")
    assert(got.get((1L, 3L)).contains(1), s"append pair missing: $got")
    assert(got.get((1L, 5L)).contains(0))
    // (2,3) edits BOTH ends (sub at head, append at tail) — neither block
    // agrees: the documented heuristic incompleteness, pinned here.
    assert(!got.contains((2L, 3L)))
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("fuzzy pairs: a hot shared prefix splinters across length buckets, output exact") {
    val s = spark
    import s.implicits._
    // 120 titles all sharing prefix "the " AND suffix (reversed prefix
    // agrees too) with lengths spread 8..67 — the skewed-corpus shape
    // that re-opens the blocking quadratic if prefix/suffix is the only key
    val rows = (0 until 120).map { i =>
      (i.toLong, "the " + ("x" * (4 + i % 60)) + "end")
    }.toDF("id", "s")
    val got = graft.operators.DedupOps
      .fuzzySelfPairs(rows, maxDist = 2, blockLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // exactness against driver-side brute force (the blocking must not
    // change one output row)
    val strs = (0 until 120).map(i => "the " + ("x" * (4 + i % 60)) + "end")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- 0 until 120; b <- a + 1 until 120
      dd = lev(strs(a), strs(b)) if dd <= 2
    } yield (a.toLong, b.toLong) -> dd).toMap
    assert(got == want)
    // fan-out bound: the largest (block-type, key, length-bucket) block
    // holds only the handful of length-adjacent rows, not all 120 — the
    // quadratic the second key exists to prevent
    val w = 3 // maxDist + 1
    val maxBlock = (0 until 120)
      .flatMap { i =>
        val l = strs(i).length
        Seq(l / w, (l + 2) / w).distinct.map(lb => ("pfx", lb))
      }
      .groupBy(identity).values.map(_.size).max
    assert(maxBlock <= 12, s"hot block not bounded: $maxBlock of 120")
  }

  test("JL projection: linear, deterministic, and roughly distance-preserving") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val p = SimilarityOps.projectionMatrix(dim = 64, outDim = 16)
    assert(p.length == 16 && p.forall(_.length == 64))
    assert(SimilarityOps.projectionMatrix(64, 16).flatten.toSeq == p.flatten.toSeq)
    val proj = SimilarityOps.projectEmbeddings(emb, p).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = emb.select(col("vec_id"),
        SimilarityOps.vecD(col("embedding")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // exact linearity per component vs a driver-side dot
    for (id <- raw.keys.take(10); j <- 0 until 16) {
      var acc = 0.0; var i = 0
      while (i < 64) { acc += raw(id)(i) * p(j)(i); i += 1 }
      assert(math.abs(proj(id)(j) - acc) < 1e-12)
    }
    // JL distance preservation in expectation: with N(0,1) entries,
    // E[(P_j·x)^2] = ||x||^2, so ||proj||^2 / outDim tracks ||x||^2
    // within a loose band on average
    def sq(a: Array[Double]) = a.map(x => x * x).sum
    val ratios = raw.keys.take(50).toSeq
      .filter(id => sq(raw(id)) > 0)
      .map(id => (sq(proj(id)) / 16.0) / sq(raw(id)))
    val meanRatio = ratios.sum / ratios.length
    assert(meanRatio > 0.5 && meanRatio < 2.0, s"mean energy ratio $meanRatio")
  }

  test("bigram LM scores match hand counts; short docs emit no row") {
    val docs = docsDF((1L, "a b a"), (2L, "a b"), (3L, "c"))
    val got = graft.operators.SearchOps.bigramLmScores(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // uni: a=3 b=2 c=1, V=3; bg: "a b"=2, "b a"=1
    // doc1: p(a b)=(2+1)/(3+3)=0.5, p(b a)=(1+1)/(2+3)=0.4 -> mean 0.45
    // doc2: p(a b)=0.5; doc3: single token, no bigrams, NO row
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L)._1 - 0.45) < 1e-9 && got(1L)._2 == 2L)
    assert(math.abs(got(2L)._1 - 0.5) < 1e-9 && got(2L)._2 == 1L)
  }

  test("quality model: GD reduces loss, scoring mimics the weak rule, deterministic") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    import graft.operators.QualityModel
    val w0 = Array.fill(QualityModel.numFeatures)(0.0)
    val w = QualityModel.trainLogistic(docs)
    assert(QualityModel.meanLoss(docs, w) < QualityModel.meanLoss(docs, w0),
      "training did not reduce logistic loss")
    // the fitted model reproduces the weak-supervision rule on most docs
    val scored = QualityModel.score(docs, w)
    val labeled = docs.select(col("doc_id"),
      QualityModel.weakLabel(col("text")).as("y"))
    val agree = scored.join(labeled, "doc_id")
      .select(((col("keep") === (col("y") === 1.0)).cast("int")).as("ok"))
      .agg(avg("ok")).head.getDouble(0)
    assert(agree >= 0.8, s"model/rule agreement only $agree")
    // exact-decimal gradient sums make training run-to-run deterministic
    assert(QualityModel.trainLogistic(docs).sameElements(w))
  }

  // ---- SemDeDup (within-cluster semantic dedup) ----

  test("semdedup: dominated-by-any-lower-id semantics along a chain") {
    val s = spark
    import s.implicits._
    // One cluster; a<b<c on a 20-degree fan: cos(a,b)=cos(b,c)~0.94 >= tau,
    // cos(a,c)~0.77 < tau. b drops (dominated by a); c drops too — its
    // dominator b is itself dropped, but domination is order-independent.
    def rot(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val vecs = Seq((1L, rot(0)), (2L, rot(20)), (3L, rot(40)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0))
    val kept = SimilarityOps.semanticKeep(vecs, cents, tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"chain should keep only its lowest id, got $kept")
    val pairs = SimilarityOps.semanticDupPairs(vecs, cents, tau = 0.9)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)))
  }

  test("semdedup: clusters bound the candidate set — cross-cluster dups are missed") {
    val s = spark
    import s.implicits._
    // Two near-identical vectors straddling the centroid boundary: the
    // published SemDeDup trade (accepted miss surface) — both survive.
    // dots against c0=(1,0) / c1=(cos6°,sin6°): v1 1.0 vs 0.9987 → c0;
    // v2 1.0 vs 1.0029 → c1; v3 1.0 vs 0.9988 → c0.
    val vecs = Seq(
      (1L, Array(1f, 0.04f)),
      (2L, Array(1f, 0.08f)),
      (3L, Array(1f, 0.041f)))
    .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.9945, 0.1045))
    val asg = SimilarityOps.assignToCentroids(vecs, cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster_id")).toMap
    assert(asg(1L) == 0 && asg(2L) == 1 && asg(3L) == 0, s"planted split broke: $asg")
    val kept = SimilarityOps.semanticKeep(vecs, cents, tau = 0.99)
      .collect().map(_.getLong(0)).toSet
    // cosine(1,2) ~0.9992 >= tau but different clusters: 2 survives;
    // cosine(1,3) ~0.99999 same cluster: 3 drops.
    assert(kept == Set(1L, 2L), s"expected cross-cluster miss + in-cluster drop, got $kept")
  }

  test("semdedup candidate generation is a cluster equi-join — no cartesian in the plan") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val vecs = (0 until 64).map(i => (i.toLong, Array.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array.fill(8)(0.1), Array.fill(8)(-0.1))
    val plan = SimilarityOps.semanticDupPairs(vecs, cents, tau = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
