package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {

  /** Driver-side replica of the integer PageRank recurrence. */
  private def simulate(edges: Seq[(Long, Long)], iters: Int,
                       scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = (scale * 15L) / (100L * n)
    var pr = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val cin = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => (pr(s) * 85L) / (100L * outdeg(s)) }.sum).toMap
      pr = nodes.map(v => v -> (teleport + cin.getOrElse(v, 0L))).toMap
    }
    pr
  }

  test("pageRank matches the integer recurrence, sinks evaporate, checkpointing is a no-op") {
    val s = spark
    import s.implicits._
    // 0 and 1 feed each other and 2; 2 is a SINK (appears only as dst of
    // others and src of nothing... give it no out-edges by listing it only
    // as a dst); 3 points at 0; a multi-edge 3->0 duplicated and a
    // self-loop on 1.
    val edges = Seq(
      (0L, 1L), (0L, 2L),
      (1L, 0L), (1L, 1L),
      (3L, 0L), (3L, 0L))
    val df = edges.toDF("src", "dst")
    val want = simulate(edges, iters = 5)
    val got = GraphOps.pageRank(df, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"got $got want $want")
    // node 2 (sink) holds exactly teleport + inflow from 0; its own mass
    // evaporates rather than redistributing
    assert(got.contains(2L))
    // lineage checkpointing must not change a single unit
    val ck = GraphOps.pageRank(df, iters = 5, checkpointEvery = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ck == want)
    // total mass stays <= scale (truncation only ever loses units)
    assert(got.values.sum <= 1000000000000L)
  }

  test("hashLinkGraph derives a dense in-range edge set and pageRank runs over it") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val n = docs.count()
    val edges = GraphOps.hashLinkGraph(docs, fanout = 3)
    assert(edges.count() == 3 * n)
    val bad = edges.where(col("dst") < 0 || col("dst") >= n).count()
    assert(bad == 0)
    val pr = GraphOps.pageRank(edges, iters = 2).collect()
    assert(pr.length == n) // every doc is a src, so every doc is a node
    assert(pr.map(_.getLong(1)).sum <= 1000000000000L)
  }

  test("hashLinkGraph diagnoses empty input and accepts int-typed doc_id") {
    val s = spark
    import s.implicits._
    // empty relation: a clear message, not a misleading dense-[0,0) require
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      GraphOps.hashLinkGraph(empty)
    }
    assert(e.getMessage.contains("empty document relation"))
    // int-typed ids: the explicit long cast reads them instead of a CCE
    val ints = Seq((0, "a"), (1, "b"), (2, "c")).toDF("doc_id", "text")
    assert(GraphOps.hashLinkGraph(ints, fanout = 2).count() == 6)
  }
}
