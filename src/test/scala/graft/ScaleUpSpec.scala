package graft

import org.apache.spark.sql.functions._

/** Pins the invariants [[ScaleUp]]'s scaled directories promise, on a
  * factor-2 copy of the sf0.001 fixture: facts grow exactly ×factor with
  * disjoint replica key ranges, join relationships survive inside every
  * replica, dims copy through byte-identically, and document replicas are
  * token-disjoint (so the near-dup pipelines see a genuinely larger corpus,
  * not a stack of exact copies). */
class ScaleUpSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val dst: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_scaleup_spec").toString
    ScaleUp.run(spark, src, d, factor = 2)
    d
  }

  test("facts replicate exactly xfactor with disjoint key ranges") {
    for ((t, key) <- Seq("orders" -> "o_orderkey", "lineitem" -> "l_orderkey",
                         "events" -> "event_id", "documents" -> "doc_id")) {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val scaled = spark.read.parquet(s"$dst/$t.parquet")
      assert(scaled.count() === base.count() * 2, s"$t row count")
      val replicaKeys = scaled.where(col(key) >= 10_000_000L)
        .select(col(key) - 10_000_000L)
      val baseKeys = base.select(col(key))
      assert(replicaKeys.exceptAll(baseKeys).isEmpty &&
        baseKeys.exceptAll(replicaKeys).isEmpty, s"$t replica key offset")
    }
  }

  test("scaled events keep a non-empty tie-free slice (per-replica ts offsets)") {
    // Without per-replica ts offsets every (metric, second) pair appears
    // factor times and the unique-series slice — the exact-parity domain
    // of the typed streaming twins — is EMPTY at scale (found when
    // stream_dedup_parity hit its empty-fixture fallback at sf1).
    val evRaw = spark.read.parquet(s"$dst/events.parquet")
    val ev = evRaw.select(
      col("event_type").as("metric"), Tables.tsEpochSeconds(evRaw).as("e"))
    val unique = ev.groupBy("metric", "e").count().where(col("count") === 1)
    assert(unique.count() > 0, "tie-free slice must be non-empty in scaled dirs")
  }

  test("order->lineitem join relationship holds inside the replica") {
    val o = spark.read.parquet(s"$dst/orders.parquet").where(col("o_orderkey") >= 10_000_000L)
    val l = spark.read.parquet(s"$dst/lineitem.parquet").where(col("l_orderkey") >= 10_000_000L)
    val dangling = l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
    assert(dangling.isEmpty, "replica lineitem rows must join replica orders")
  }

  test("dims copy through byte-identically") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "embeddings")) {
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$src/$t.parquet"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dst/$t.parquet"))
      assert(java.util.Arrays.equals(a, b), s"$t bytes")
    }
  }

  test("document replicas are token-disjoint from the base corpus") {
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val baseTokens = docs.where(col("doc_id") < 10_000_000L)
      .select(explode(operators.TextOps.tokens(col("text"))).as("t")).distinct()
    val replTokens = docs.where(col("doc_id") >= 10_000_000L)
      .select(explode(operators.TextOps.tokens(col("text"))).as("t")).distinct()
    assert(replTokens.join(baseTokens, "t").isEmpty,
      "suffixed replica tokens must not collide with base tokens")
    // ...while token COUNTS per doc are preserved, so within-replica
    // shingle/similarity structure matches the base corpus exactly.
    val counts = docs.select(
      (col("doc_id") % 10_000_000L).as("base_id"),
      operators.TextOps.tokenCount(col("text")).as("n"))
      .groupBy("base_id").agg(countDistinct("n").as("variants"))
    assert(counts.where(col("variants") =!= 1).isEmpty,
      "replica token counts must match the base doc")
  }
}
