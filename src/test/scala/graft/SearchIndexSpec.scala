package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SearchOps
import graft.sources.{SearchIndex, SnapshotStore}

/** Inverted-index contract: served results are BIT-EQUAL to the full
  * corpus scan, incremental growth equals rebuild, and term lookups
  * actually prune posting files (the whole point of the index). */
class SearchIndexSpec extends SparkSpec {

  private def docsDF(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** A corpus whose vocabulary is term-range-separable, so range
    * clustering puts different terms into different files. */
  private def corpus(n: Int): DataFrame =
    docsDF((0L until n.toLong).map { i =>
      val w = ('a' + (i % 8).toInt).toChar.toString * 3 // aaa..hhh
      (i, s"$w common$i filler ${"zzz" * (1 + (i % 3).toInt)}")
    }: _*)

  private def withRoot(f: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("sidx_spec").toString
    try f(root) finally SnapshotStore.deleteTree(root)
  }

  test("served bm25 is bit-equal to the full scan, and absent terms match") {
    withRoot { root =>
      val docs = corpus(64)
      SearchIndex.index(spark, docs, root, buckets = 4)
      // 'nosuchterm' has no postings: the served side must reproduce the
      // scan side's +0.0 contribution, not drop the doc or NaN the score
      val terms = Seq("aaa", "filler", "nosuchterm")
      val served = SearchIndex.bm25(spark, root, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val scanned = SearchOps.bm25(docs, terms, k = 10)
        .select(col("doc_id"), col("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served == scanned) // exact doubles: same expression tree
    }
  }

  test("incrementally grown index answers identically to a rebuild") {
    withRoot { root => withRoot { root2 =>
      val docs = corpus(64)
      SearchIndex.index(spark, docs.where(col("doc_id") < 32), root, buckets = 4)
      SearchIndex.index(spark, docs.where(col("doc_id") >= 32), root, buckets = 4)
      SearchIndex.index(spark, docs, root2, buckets = 4)
      val terms = Seq("bbb", "filler")
      val grown = SearchIndex.bm25(spark, root, terms, k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val rebuilt = SearchIndex.bm25(spark, root2, terms, k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(grown == rebuilt)
      // stats rows are additive: two deltas reduce to the full corpus
      val st = SearchIndex.corpusStats(spark, root).collect()(0)
      val st2 = SearchIndex.corpusStats(spark, root2).collect()(0)
      assert(st.getDouble(0) == 64.0 && st == st2)
    }}
  }

  test("term lookup prunes posting files via the bloom sidecar") {
    withRoot { root =>
      SearchIndex.index(spark, corpus(256), root, buckets = 8)
      // range clustering on term puts 'aaa' (first of the vocabulary)
      // into a narrow file range; the bloom must skip most of the rest
      val (sel, total) = SnapshotStore.planFilesEq(spark, root, -1, "term", "aaa")
      assert(total >= 8, s"expected the range layout to spread files, got $total")
      assert(sel.size < total, s"no pruning: $sel of $total files selected")
      // and the pruned read is still complete: every doc with 'aaa'
      val got = SearchIndex.containingAll(spark, root, Seq("aaa"))
        .collect().map(_.getLong(0)).toSet
      assert(got == (0L until 256L by 8).toSet)
    }
  }

  test("conjunctive containment equals the corpus predicate; misses are empty") {
    withRoot { root =>
      val docs = corpus(64)
      SearchIndex.index(spark, docs, root, buckets = 4)
      val got = SearchIndex.containingAll(spark, root, Seq("ccc", "filler"))
        .collect().map(_.getLong(0)).toSet
      val want = docs
        .where(array_contains(operators.TextOps.tokens(col("text")), "ccc") &&
          array_contains(operators.TextOps.tokens(col("text")), "filler"))
        .collect().map(_.getLong(0)).toSet
      assert(got == want && want.nonEmpty)
      assert(SearchIndex.containingAll(spark, root, Seq("nosuchterm")).isEmpty)
    }
  }

  test("phrase search: overlap, repeated words, boundaries, cross-batch growth") {
    withRoot { root =>
      SearchIndex.index(spark,
        docsDF(
          (0L, "x a a a y"),   // "a a" occurs twice, OVERLAPPING
          (1L, "a b end"),     // phrase at doc start
          (2L, "lead a b"),    // phrase at doc end
          (3L, "b a nothing"), // reversed order — must NOT match "a b"
          (4L, "a x b")),      // gap — must NOT match
        root, buckets = 2)
      // incremental growth: the phrase resolver must see batch-2 postings
      SearchIndex.index(spark, docsDF((5L, "z a b z a b")), root, buckets = 2)
      def hits(ph: String*) =
        SearchIndex.containingPhrase(spark, root, ph)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(hits("a", "b") == Map(1L -> 1L, 2L -> 1L, 5L -> 2L))
      assert(hits("a", "a") == Map(0L -> 2L)) // overlapping occurrences count
      assert(hits("a", "a", "a") == Map(0L -> 1L))
      assert(hits("nosuchword", "b").isEmpty)
    }
  }

  test("deleting docs re-centers the index exactly to the surviving corpus") {
    withRoot { root => withRoot { root2 =>
      val docs = corpus(64)
      SearchIndex.index(spark, docs, root, buckets = 4)
      SearchIndex.deleteDocsWhere(spark, root, col("doc_id") % 4 === 1)
      // the reference: an index BUILT on the survivors
      SearchIndex.index(spark, docs.where(col("doc_id") % 4 =!= 1), root2,
        buckets = 4)
      val terms = Seq("aaa", "filler")
      val after = SearchIndex.bm25(spark, root, terms, k = 30)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val rebuilt = SearchIndex.bm25(spark, root2, terms, k = 30)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(after == rebuilt) // exact doubles: N/sumdl/df all re-centered
      assert(SearchIndex.corpusStats(spark, root).collect()(0)
        == SearchIndex.corpusStats(spark, root2).collect()(0))
      // deleted docs are unreachable through every probe
      assert(!SearchIndex.containingAll(spark, root, Seq("filler"))
        .collect().map(_.getLong(0)).exists(_ % 4 == 1))
      // deleting nothing changes nothing
      SearchIndex.deleteDocsWhere(spark, root, col("doc_id") === -999L)
      val again = SearchIndex.bm25(spark, root, terms, k = 30)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(again == after)
      // the doc-level contract is ENFORCED: a posting-row predicate (on
      // term/tf/dl) would delete partial postings yet decrement whole-doc
      // stats — refused before anything rewrites, index unchanged
      val e = intercept[IllegalArgumentException](
        SearchIndex.deleteDocsWhere(spark, root, col("term") === "aaa"))
      assert(e.getMessage.contains("doc-level"))
      val mixed = intercept[IllegalArgumentException](
        SearchIndex.deleteDocsWhere(spark, root,
          col("doc_id") === 2L && col("tf") > 1L))
      assert(mixed.getMessage.contains("doc-level"))
      // NONDETERMINISTIC predicates refuse — the stats decrement and the
      // CoW rewrite each evaluate cond, so rand() would retract different
      // stats than the rows deleted (gated on the RESOLVED tree: an
      // unresolved 'rand() reports deterministic == true)
      val nondet = intercept[IllegalArgumentException](
        SearchIndex.deleteDocsWhere(spark, root,
          col("doc_id") === 2L || rand() < 0.5))
      assert(nondet.getMessage.contains("deterministic"))
      // ref-free but row-varying refuses too (not foldable)
      val refFree = intercept[IllegalArgumentException](
        SearchIndex.deleteDocsWhere(spark, root,
          org.apache.spark.sql.functions.spark_partition_id() === 0))
      assert(refFree.getMessage.contains("deterministic") ||
        refFree.getMessage.contains("doc-level"))
      assert(SearchIndex.bm25(spark, root, terms, k = 30)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == after)
    }}
  }

  test("topkAny: rank is deterministic under ties, misses are empty, bad input refuses") {
    withRoot { root =>
      // three docs with IDENTICAL text (equal scores) plus distinct ones:
      // the tie-break must be doc_id ASC, reproducibly
      val docs = docsDF(
        (Seq(5L, 9L, 2L).map(i => (i, "needle in a stack")) ++
          Seq((20L, "needle needle sharp"), (21L, "plain filler text"))): _*)
      SearchIndex.index(spark, docs, root, buckets = 2)
      val got = SearchIndex.topkAny(spark, root, Seq("needle", "sharp"), k = 10)
        .select("rank", "doc_id").collect().map(r => (r.getInt(0), r.getLong(1)))
      // doc 20 scores highest (tf=2 + 'sharp'); the tied trio follows in id order
      assert(got.head == (1, 20L), s"wrong top doc: ${got.toSeq}")
      assert(got.toSeq.drop(1) == Seq((2, 2L), (3, 5L), (4, 9L)),
        s"tie-break not doc_id ASC: ${got.toSeq}")
      // rank agrees with an independent sort of the unranked scores
      val scores = SearchIndex.bm25(spark, root, Seq("needle", "sharp"), k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, s) => (-s, id) }.map(_._1).toSeq
      assert(got.map(_._2).toSeq == scores)
      // absent-everything query: empty result, not a crash or NaN
      assert(SearchIndex.topkAny(spark, root, Seq("nosuchterm"), k = 5).isEmpty)
      // duplicate terms would double-count slots: refused like bm25
      intercept[IllegalArgumentException](
        SearchIndex.topkAny(spark, root, Seq("needle", "needle")))
      // empty term list refuses (postingsFor contract)
      intercept[IllegalArgumentException](
        SearchIndex.topkAny(spark, root, Seq.empty))
    }
  }

  test("topkExcluding: excluded docs drop BEFORE ranking; polarity and delete-all relax") {
    withRoot { root =>
      // high-scoring docs that carry the banned term must not consume a
      // rank slot — the surviving docs fill the top-k densely
      val docs = docsDF(
        (1L, "needle needle needle banned"), // would be rank 1 if excluded late
        (2L, "needle needle plain"),
        (3L, "needle banned extra"),
        (4L, "needle plain text"),
        (5L, "needle other stuff"),
        (6L, "plain filler only"))
      SearchIndex.index(spark, docs, root, buckets = 2)
      val got = SearchIndex.topkExcluding(spark, root,
        Seq("needle"), Seq("banned"), k = 3)
        .select("rank", "doc_id").collect().map(r => (r.getInt(0), r.getLong(1)))
      assert(got.toSeq == Seq((1, 2L), (2, 4L), (3, 5L)),
        s"exclusion must run before the top-k cut: ${got.toSeq}")
      // scores bit-equal to bm25 on the surviving docs
      val full = SearchIndex.bm25(spark, root, Seq("needle"), k = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      SearchIndex.topkExcluding(spark, root, Seq("needle"), Seq("banned"), k = 3)
        .collect().foreach(r =>
          assert(r.getDouble(1) == full(r.getLong(0)), "score drifted"))
      // absent exclusion term == plain ranked OR
      val plain = SearchIndex.topkAny(spark, root, Seq("needle"), k = 3)
        .collect().map(_.toString).toSeq
      val noop = SearchIndex.topkExcluding(spark, root,
        Seq("needle"), Seq("nosuchterm"), k = 3)
        .collect().map(_.toString).toSeq
      assert(noop == plain)
      // empty exclusion refuses (use topkAny)
      intercept[IllegalArgumentException](
        SearchIndex.topkExcluding(spark, root, Seq("needle"), Seq.empty))
      // literal-only delete (delete-all) is doc-level by definition and
      // must be accepted: stats re-center to the empty corpus
      SearchIndex.deleteDocsWhere(spark, root, lit(true))
      assert(SearchIndex.containingAll(spark, root, Seq("needle")).isEmpty)
      val st = SearchIndex.corpusStats(spark, root).collect()(0)
      assert(st.getDouble(0) == 0.0 && st.getDouble(1) == 0.0,
        s"delete-all left stats uncentered: $st")
    }
  }

  test("reindex == rebuild on the updated corpus; every crash window converges on replay") {
    def updatedCorpus: DataFrame = {
      val base = corpus(64)
      // mutate a slice (longer text, new term), leave the rest alone —
      // and add one brand-new doc (the upsert-insert leg)
      base.where(col("doc_id") % 4 =!= 1)
        .unionByName(base.where(col("doc_id") % 4 === 1)
          .withColumn("text", concat(col("text"), lit(" fresh fresh"))))
        .unionByName(docsDF((1000L, "fresh brand new doc")))
    }
    def updateBatch: DataFrame =
      corpus(64).where(col("doc_id") % 4 === 1)
        .withColumn("text", concat(col("text"), lit(" fresh fresh")))
        .unionByName(docsDF((1000L, "fresh brand new doc")))
    val terms = Seq("aaa", "filler", "fresh")
    def answers(root: String): Seq[(Long, Double)] =
      SearchIndex.bm25(spark, root, terms, k = 40)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // clean run: reindex == rebuild, bit-equal scores and stats
    withRoot { root => withRoot { root2 =>
      SearchIndex.indexEpoch(spark, corpus(64), root, epochId = 0L)
      SearchIndex.reindexEpoch(spark, updateBatch, root, epochId = 1L)
      SearchIndex.index(spark, updatedCorpus, root2)
      assert(answers(root) == answers(root2))
      assert(SearchIndex.corpusStats(spark, root).collect()(0)
        == SearchIndex.corpusStats(spark, root2).collect()(0))
      // full replay of a completed reindex is a version-level no-op
      val v = SnapshotStore.currentVersion(root)
      SearchIndex.reindexEpoch(spark, updateBatch, root, epochId = 1L)
      assert(SnapshotStore.currentVersion(root) == v)
    }}

    // every crash window: abort after step n, then replay to completion —
    // the converged index must equal the clean run's
    (1 to 3).foreach { n =>
      withRoot { root => withRoot { root2 =>
        SearchIndex.indexEpoch(spark, corpus(64), root, epochId = 0L)
        val e = intercept[IllegalArgumentException](
          SearchIndex.reindexEpochInternal(spark, updateBatch, root,
            epochId = 1L, buckets = 8, crashAfter = n))
        assert(e.getMessage.contains("test crash"))
        SearchIndex.reindexEpoch(spark, updateBatch, root, epochId = 1L)
        SearchIndex.index(spark, updatedCorpus, root2)
        assert(answers(root) == answers(root2),
          s"crash window $n did not converge on replay")
        assert(SearchIndex.corpusStats(spark, root).collect()(0)
          == SearchIndex.corpusStats(spark, root2).collect()(0),
          s"crash window $n drifted the corpus stats")
      }}
    }
  }

  test("epoch-stamped ingest: replays are no-ops, stats never drift, blooms land") {
    withRoot { root =>
      val b0 = corpus(64).where(col("doc_id") < 32)
      val b1 = corpus(64).where(col("doc_id") >= 32)
      SearchIndex.indexEpoch(spark, b0, root, epochId = 0L)
      SearchIndex.indexEpoch(spark, b1, root, epochId = 1L)
      val snap = SearchIndex.bm25(spark, root, Seq("aaa", "filler"), k = 20)
        .collect().toSeq
      val statsSnap = SearchIndex.corpusStats(spark, root).collect()(0)
      // a crash-restarted stream re-delivers the last trigger: no-op on
      // BOTH stores (a drifted stats row would shift every bm25 score)
      SearchIndex.indexEpoch(spark, b1, root, epochId = 1L)
      assert(SearchIndex.bm25(spark, root, Seq("aaa", "filler"), k = 20)
        .collect().toSeq == snap)
      assert(SearchIndex.corpusStats(spark, root).collect()(0) == statsSnap)
      assert(statsSnap.getDouble(0) == 64.0)
      // the post-commit bloom sidecar is live: lookups prune epoch dirs too
      val (sel, total) = SnapshotStore.planFilesEq(spark, root, -1, "term", "aaa")
      assert(sel.size < total, s"epoch-path blooms missing: $sel of $total")
    }
  }

  test("a crash between the postings and stats commits converges on replay") {
    withRoot { root =>
      val b0 = corpus(64).where(col("doc_id") < 32)
      val b1 = corpus(64).where(col("doc_id") >= 32)
      SearchIndex.indexEpoch(spark, b0, root, epochId = 0L)
      // simulate the torn trigger: epoch 1's POSTINGS committed but the
      // process died before the stats row (the at-least-once window)
      SnapshotStore.appendEpoch(
        SearchIndex.postingsOf(b1), root, epochId = 1L)
      assert(SearchIndex.corpusStats(spark, root).collect()(0).getDouble(0)
        == 32.0) // drifted: postings know 64 docs, stats only 32
      // the checkpoint restart re-delivers the same trigger: postings
      // no-op, the MISSING stats row lands — per-store epoch guards
      SearchIndex.indexEpoch(spark, b1, root, epochId = 1L)
      assert(SearchIndex.corpusStats(spark, root).collect()(0).getDouble(0)
        == 64.0)
      // and the converged index answers like a clean build
      withRoot { root2 =>
        SearchIndex.index(spark, corpus(64), root2, buckets = 8)
        assert(SearchIndex.bm25(spark, root, Seq("aaa", "filler"), k = 20)
          .collect().toSeq ==
          SearchIndex.bm25(spark, root2, Seq("aaa", "filler"), k = 20)
            .collect().toSeq)
      }
    }
  }

  test("repairStats rebuilds the stats store from postings exactly") {
    withRoot { root =>
      val docs = corpus(64)
      SearchIndex.index(spark, docs.where(col("doc_id") < 32), root, buckets = 4)
      // simulate the batch-path crash: postings landed, stats row didn't
      SnapshotStore.appendWithBloom(
        SearchIndex.postingsOf(docs.where(col("doc_id") >= 32))
          .repartitionByRange(4, col("term"), col("doc_id")),
        root, "term")
      SearchIndex.repairStats(spark, root)
      val st = SearchIndex.corpusStats(spark, root).collect()(0)
      assert(st.getDouble(0) == 64.0)
      // bit-equal to a clean build's stats AND scores
      withRoot { root2 =>
        SearchIndex.index(spark, docs, root2, buckets = 4)
        assert(st == SearchIndex.corpusStats(spark, root2).collect()(0))
        assert(SearchIndex.bm25(spark, root, Seq("bbb", "filler"), k = 20)
          .collect().toSeq ==
          SearchIndex.bm25(spark, root2, Seq("bbb", "filler"), k = 20)
            .collect().toSeq)
      }
    }
  }

  test("repairStats carries the torn epoch's stamp: the replay cannot double-count") {
    withRoot { root =>
      SearchIndex.indexEpoch(spark, corpus(64).where(col("doc_id") < 32),
        root, epochId = 0L)
      // torn trigger: epoch 1's postings landed, stats did not
      SnapshotStore.appendEpoch(
        SearchIndex.postingsOf(corpus(64).where(col("doc_id") >= 32)),
        root, epochId = 1L)
      SearchIndex.repairStats(spark, root) // operator repairs mid-outage
      assert(SearchIndex.corpusStats(spark, root).collect()(0).getDouble(0)
        == 64.0)
      // the stream restarts and replays epoch 1: BOTH stores must no-op —
      // an unstamped repair would re-append the batch's stats mass here
      SearchIndex.indexEpoch(spark, corpus(64).where(col("doc_id") >= 32),
        root, epochId = 1L)
      assert(SearchIndex.corpusStats(spark, root).collect()(0).getDouble(0)
        == 64.0, "replayed epoch re-counted mass the repair already covered")
    }
  }

  test("null text fails loudly before anything commits") {
    withRoot { root =>
      val s = spark
      import s.implicits._
      SearchIndex.index(spark, corpus(8), root, buckets = 2)
      val withNull = Seq((100L, "fine words"), (101L, null))
        .toDF("doc_id", "text")
      intercept[IllegalArgumentException](
        SearchIndex.index(spark, withNull, root))
      intercept[IllegalArgumentException](
        SearchIndex.indexEpoch(spark, withNull, root, epochId = 9L))
      // nothing landed: postings, stats, and scores all unchanged
      assert(SearchIndex.corpusStats(spark, root).collect()(0).getDouble(0)
        == 8.0)
      assert(SearchIndex.containingAll(spark, root, Seq("fine")).isEmpty)
      // the empty string stays IN contract (tokenizes to one empty token)
      SearchIndex.index(spark, Seq((102L, "")).toDF("doc_id", "text"), root)
      assert(SearchIndex.corpusStats(spark, root).collect()(0).getDouble(0)
        == 9.0)
    }
  }

  test("compaction restores pruning and answers stay bit-identical") {
    withRoot { root =>
      val docs = corpus(128)
      // fragment: 4 epoch drips + a CoW delete (its rewrite dirs have no
      // bloom rows, so lookups conservatively read them)
      (0 until 4).foreach { i =>
        SearchIndex.indexEpoch(spark,
          docs.where(col("doc_id") % 4 === i), root, epochId = i.toLong)
      }
      SearchIndex.deleteDocsWhere(spark, root, col("doc_id") % 8 === 5)
      val terms = Seq("aaa", "filler")
      val before = SearchIndex.bm25(spark, root, terms, k = 40).collect().toSeq
      val phraseBefore = SearchIndex
        .containingPhrase(spark, root, Seq("aaa", "common2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      SearchIndex.compactIndex(spark, root, targetFiles = 8)

      assert(SearchIndex.bm25(spark, root, terms, k = 40)
        .collect().toSeq == before)
      assert(SearchIndex.containingPhrase(spark, root, Seq("aaa", "common2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == phraseBefore)
      // geometry restored: 8 files total, a term lookup prunes most
      val (sel, total) = SnapshotStore.planFilesEq(spark, root, -1, "term", "aaa")
      assert(total == 8, s"expected the compacted layout, got $total files")
      assert(sel.size < total, s"no pruning after compaction: $sel of $total")
      // stats store folded to one row, value preserved
      val sf = SnapshotStore.read(spark, s"$root/_corpusstats")
      assert(sf.count() == 1)
      assert(SearchIndex.corpusStats(spark, root).collect()(0).getDouble(0)
        == 128.0 - 16.0)
    }
  }

  test("lifecycle torture: served bm25 == clean rebuild after every maintenance step") {
    withRoot { root =>
      // seeded mixed sequence of batch ingest, epoch ingest, RTBF delete,
      // and compaction; after EVERY step the served scores must equal an
      // index rebuilt from scratch on the same surviving corpus
      val rnd = new scala.util.Random(7)
      val terms = Seq("aaa", "filler")
      var live = Map.empty[Long, String]
      var nextId = 0L
      var epoch = 0L
      def ingest(n: Int, viaEpoch: Boolean): Unit = {
        val batch = (0 until n).map { _ =>
          val id = nextId; nextId += 1
          val w = ('a' + (id % 6).toInt).toChar.toString * 3
          id -> s"$w common${id % 5} filler"
        }
        live ++= batch
        val df = docsDF(batch: _*)
        if (viaEpoch) { SearchIndex.indexEpoch(spark, df, root, epoch); epoch += 1 }
        else SearchIndex.index(spark, df, root, buckets = 4)
      }
      ingest(20, viaEpoch = false)
      (1 to 8).foreach { step =>
        rnd.nextInt(4) match {
          case 0 => ingest(10, viaEpoch = false)
          case 1 => ingest(10, viaEpoch = true)
          case 2 =>
            val m = (step % 3 + 2).toLong
            live = live.filter { case (id, _) => id % m != 1 }
            SearchIndex.deleteDocsWhere(spark, root, col("doc_id") % m === 1)
          case 3 => SearchIndex.compactIndex(spark, root, targetFiles = 4)
        }
        withRoot { ref =>
          SearchIndex.index(spark, docsDF(live.toSeq.sortBy(_._1): _*), ref,
            buckets = 4)
          assert(SearchIndex.bm25(spark, root, terms, k = 50).collect().toSeq
            == SearchIndex.bm25(spark, ref, terms, k = 50).collect().toSeq,
            s"diverged from the clean rebuild after step $step")
        }
      }
    }
  }

  test("served bm25 plan: broadcast df/stats joins, no cartesian") {
    withRoot { root =>
      SearchIndex.index(spark, corpus(32), root, buckets = 2)
      val plan = SearchIndex.bm25(spark, root, Seq("aaa", "filler"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"))
      assert(!plan.contains("CartesianProduct"))
      assert(plan.contains("TakeOrderedAndProject"))
    }
  }
}
