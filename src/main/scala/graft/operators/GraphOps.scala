package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations — PageRank as the
  * representative fixed-point workload (the corpus-level authority signal a
  * curation pipeline uses to weight interlinked document collections, e.g.
  * crawl graphs).
  *
  * The distinguishing design choice is EXACT INTEGER arithmetic: ranks are
  * long micro-units (`scale` = 1e12 ≙ total mass 1.0) and every damping /
  * out-degree step is integral division, so per-iteration sums are
  * order-independent longs — the result is bit-identical across
  * partitionings, retries, AND engines, which lets a fixed-iteration run
  * face a DuckDB oracle as unrolled SQL stages (floating PageRank can only
  * ever be compared approximately). Truncation loses ≤1 unit per edge per
  * iteration of 1e12 total mass — immaterial to ranking, decisive for
  * verifiability.
  */
object GraphOps {

  /** Fixed-iteration damped PageRank over a directed edge list `(src,
    * dst)` (long ids; multi-edges count once per occurrence, self-loops
    * allowed).
    *
    * Per iteration `pr'(v) = teleport + Σ_{(u,v)∈E} (pr(u)·dampNum) div
    * (dampDen·outdeg(u))` with `teleport = (scale·(dampDen−dampNum)) div
    * (dampDen·n)`. Nodes without out-edges (sinks) simply contribute
    * nothing — their damped mass evaporates rather than redistributing,
    * the simplest deterministic dangling policy and the one the SQL
    * oracle mirrors stage for stage.
    *
    * Scale shape: the edge relation joins its out-degrees ONCE, is
    * repartitioned by `src` and cached — every iteration's contribution
    * join reuses that layout (only the rank side reshuffles), followed by
    * one map-side-combined `dst`-keyed sum and a left join back onto the
    * node set. That is the canonical distributed PageRank round: 2
    * exchanges per iteration, state = one long per node, no driver-side
    * data. `checkpointEvery` truncates lineage for long runs (the
    * [[DedupOps.nearDupGroups]] posture); 0 composes all rounds into one
    * plan (right for the oracle-gate's few iterations).
    *
    * @return (node_id, pr long micro-units)
    */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000000000L,
               dampNum: Long = 85L, dampDen: Long = 100L,
               checkpointEvery: Int = 0,
               release: Boolean = true): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampNum > 0 && dampNum < dampDen, s"need 0 < dampNum < dampDen")
    val nodes = edges.select(col("src").as("node_id"))
      .unionByName(edges.select(col("dst").as("node_id")))
      .distinct().cache()
    val n = nodes.count()
    require(n > 0, "empty edge relation")
    val e = edges.select("src", "dst")
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")).cache()
    val teleport = (scale * (dampDen - dampNum)) / (dampDen * n)
    var pr = nodes.withColumn("pr", lit(scale / n))
    for (i <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("node_id", "src"), "src")
        .select(col("dst"),
          expr(s"(pr * ${dampNum}L) div (${dampDen}L * outdeg)").as("c"))
        .groupBy("dst").agg(sum("c").as("cin"))
      pr = nodes
        .join(contrib.withColumnRenamed("dst", "node_id"), Seq("node_id"), "left")
        .select(col("node_id"),
          (lit(teleport) + coalesce(col("cin"), lit(0L))).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        pr = pr.localCheckpoint(true)
    }
    // Materialize the final ranks BEFORE releasing the cached node/edge
    // relations (the lazy result plan references them); without the
    // unpersist every invocation would pin one edge-relation copy in
    // storage memory for the session's lifetime. `release = false` keeps
    // the LAZY composed plan (caches pinned, caller releases) — the plan-
    // audit hook, since the materialized result is a checkpoint scan.
    if (release) {
      val out = pr.localCheckpoint(true)
      nodes.unpersist(false)
      e.unpersist(false)
      out
    } else pr
  }

  /** Deterministic content-hash link graph over a dense-id document set:
    * each doc links to `fanout` pseudo-random targets `hex(md5(text ||
    * '#t'))[0,12) mod n` — a synthetic crawl graph whose edge derivation
    * is pure SQL (`conv`/hex-parse agree bytewise across engines, the
    * `shuffle_shards` precedent), giving the PageRank gate a graph both
    * engines construct independently. Requires doc_ids dense in `[0, n)`
    * (the fixture contract; asserted). */
  def hashLinkGraph(docs: DataFrame, fanout: Int = 3): DataFrame = {
    val n = docs.count()
    require(n > 0, "hashLinkGraph: empty document relation")
    // Explicit long cast: an int-typed doc_id would otherwise throw a bare
    // ClassCastException, and null bounds (impossible once n > 0) would
    // unbox to 0 and produce a misleading dense-range message.
    val bounds = docs.agg(min(col("doc_id").cast("long")),
      max(col("doc_id").cast("long"))).head
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    require(lo == 0L && hi == n - 1, s"doc_ids must be dense [0,$n), got [$lo,$hi]")
    docs.select(col("doc_id").as("src"),
      explode(array((0 until fanout).map(t =>
        pmod(conv(substring(md5(concat(col("text"), lit("#" + t))), 1, 12),
          16, 10).cast("long"), lit(n))): _*)).as("dst"))
  }
}
