package graft

import org.apache.spark.sql.functions._

import graft.operators.{HeavyHitters, TermCount}

class HeavyHittersSpec extends SparkSpec {

  // A deterministic zipf-ish stream: item i appears ~N/(i+1) times.
  private def zipfStream(nItems: Int, scale: Int): Seq[String] =
    (0 until nItems).flatMap(i => Seq.fill(scale / (i + 1))(s"item_$i"))

  private def exact(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact on small: no eviction when distincts <= cap, any stream order") {
    val items = zipfStream(20, 1000)
    val truth = exact(items)
    for (stream <- Seq(items, items.reverse, new scala.util.Random(7).shuffle(items))) {
      assert(HeavyHitters.summarize(stream.iterator, cap = 32) == truth)
    }
  }

  test("MG guarantee under eviction: c^ <= true <= c^ + N/(cap+1); big items survive") {
    val items = zipfStream(200, 5000) // 200 distincts, cap 16 -> heavy eviction
    val truth = exact(items)
    val n = items.size.toLong
    val cap = 16
    val sk = HeavyHitters.summarize(items.iterator, cap)
    assert(sk.size <= cap)
    sk.foreach { case (term, est) =>
      val t = truth(term)
      assert(est <= t, s"$term overestimated: $est > $t")
      assert(t <= est + n / (cap + 1), s"$term error bound violated")
    }
    // completeness: every item heavier than N/(cap+1) must be present
    truth.filter(_._2 > n / (cap + 1)).keys.foreach { term =>
      assert(sk.contains(term), s"heavy item $term evicted")
    }
  }

  test("union compositionality: merged partials obey the combined-stream bound") {
    val items = zipfStream(150, 4000)
    val truth = exact(items)
    val n = items.size.toLong
    val cap = 24
    // split into 4 arbitrary shards, summarize independently, tree-merge
    val shards = items.grouped(items.size / 4 + 1).toSeq
    val partials = shards.map(s => HeavyHitters.summarize(s.iterator, cap))
    val merged = partials.reduce((a, b) => HeavyHitters.combine(a, b, cap))
    assert(merged.size <= cap)
    merged.foreach { case (term, est) =>
      val t = truth(term)
      assert(est <= t && t <= est + n / (cap + 1),
        s"merged bound violated for $term: est=$est true=$t")
    }
    // and with no eviction anywhere, a merge of partials is exactly the sum
    val smallShards = zipfStream(10, 300).grouped(70).toSeq
    val exactMerge = smallShards.map(s => HeavyHitters.summarize(s.iterator, 32))
      .reduce((a, b) => HeavyHitters.combine(a, b, 32))
    assert(exactMerge == exact(zipfStream(10, 300)))
  }

  test("two-level DataFrame tier: per-group summaries merge to exact global top-k") {
    val s = spark
    import s.implicits._
    val items = zipfStream(15, 600)
    // spread the stream over 3 groups and 8 partitions: level 1 summarizes
    // per group, level 2 union-merges — counts must come back exact since
    // distincts (15) < cap
    val df = items.zipWithIndex
      .map { case (t, i) => (s"g${i % 3}", t) }.toDF("g", "term")
      .repartition(8)
    val perGroup = df.groupBy("g").agg(HeavyHitters.summary(col("term"), 64).as("sk"))
    assert(perGroup.count() == 3)
    val global = perGroup.agg(HeavyHitters.merged(col("sk"), 64).as("sk"))
      .select(explode(col("sk")).as("t"))
      .select(col("t.term"), col("t.count"))
      .as[(String, Long)].collect().toMap
    assert(global == exact(items))
  }

  test("summary output is deterministically ordered (count desc, term asc)") {
    val s = spark
    import s.implicits._
    val df = Seq("b", "a", "a", "c", "c").toDF("term")
    val out = df.agg(HeavyHitters.summary(col("term"), 8).as("sk"))
      .select(col("sk")).as[Seq[TermCount]].head()
    assert(out == Seq(TermCount("a", 2), TermCount("c", 2), TermCount("b", 1)))
  }

  test("streaming twin: replayed per-lang summaries are exact across micro-batches") {
    val s = spark
    import s.implicits._
    // doc_ids spread over the slice span so each lang's docs land in
    // DIFFERENT micro-batches — the cross-batch state merge is the thing
    // under test, not a single-batch aggregation.
    val docs = Seq(
      (1L, "en", "a b a"),
      (50L, "en", "b c"),
      (120L, "fr", "x y x"),
      (200L, "en", "a c c"),
      (260L, "fr", "y")
    ).toDF("doc_id", "lang", "text")
    val sk = graft.streaming.StreamReplay.topTermsReplay(docs, cap = 8, slices = 3)
    val got = sk.as[(String, Seq[TermCount])].collect().toMap
    assert(got("en") ==
      Seq(TermCount("a", 3), TermCount("c", 3), TermCount("b", 2)))
    assert(got("fr") == Seq(TermCount("x", 2), TermCount("y", 2)))
  }
}
