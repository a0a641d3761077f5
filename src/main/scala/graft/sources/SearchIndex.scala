package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{RelationalOps, TextOps}

/** Persisted inverted text index over a document corpus, maintained
  * incrementally through [[SnapshotStore]].
  *
  * The reference's search surface (`SearchOps.bm25`, the decontamination
  * scan) re-reads the whole corpus per query — fine for one ad-hoc
  * question, wrong for a serving path: at 100 TB every "which documents
  * mention X" probe would be a full-corpus pass. This index pays one
  * corpus pass at INGEST and makes every later lookup O(postings of the
  * queried terms):
  *
  *   - postings table (term, doc_id, dl, tf), one row per distinct
  *     (term, document) pair, stored range-clustered on `term` (each
  *     parquet file covers a narrow term range) with a per-file BLOOM
  *     sidecar on `term` — a term lookup plans its file set via
  *     [[SnapshotStore.readEq]] and touches only files that can contain
  *     the term, never the corpus and never the rest of the index;
  *   - corpus stats (doc count, total token count) as one additive delta
  *     row per ingest batch in a sibling store — BM25's global factors
  *     reduce over O(batches) tiny rows, no corpus re-scan;
  *   - maintenance is append-only and O(delta): indexing a new batch
  *     tokenizes ONLY that batch and appends its postings + one stats row.
  *     Integer-count stats are exactly additive and per-(term,doc) posting
  *     rows from disjoint batches never collide, so an incrementally grown
  *     index answers bit-identically to a from-scratch rebuild (spec- and
  *     oracle-pinned). Re-indexing or deleting EXISTING documents is out
  *     of contract (postings for the old text would double-count); updates
  *     go through rebuild.
  *
  * Served BM25 replays [[graft.operators.SearchOps.bm25]]'s exact
  * expression tree (log-free rational scoring, identical association
  * order, per-term slot columns summed in the caller's term order), so an
  * index-served score is BIT-EQUAL to the full-scan score — the
  * correctness gate runs the full-scan DuckDB oracle unchanged against
  * the served result.
  */
object SearchIndex {

  /** The corpus-stats sibling store (inside `root`, so one deleteTree
    * owns both). */
  private def statsRoot(root: String): String = s"$root/_corpusstats"

  /** Exploded (term, doc_id, dl, tf, pos) postings of a document batch —
    * `dl` is the document token count, `tf` the term's count within it,
    * `pos` the SORTED 0-based token positions (sort_array pins the
    * collect_list order, which is otherwise partition-dependent). The
    * positions make the index positional — phrase queries resolve from
    * postings alone ([[containingPhrase]]) without touching the corpus —
    * at the standard storage price (one int per occurrence). One
    * aggregate shuffle keyed (term, doc_id); tf=0 rows don't exist by
    * construction (explode emits only present terms). */
  def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        posexplode(col("w")).as(Seq("p", "term")))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("p"))).as("pos"))

  /** One (n_docs, sum_dl) delta row for a batch — ONE definition for the
    * batch and streaming ingest paths (they must stay bit-identical or a
    * mixed-path corpus breaks the grown==rebuild guarantee). NULL text
    * is OUT OF CONTRACT and fails loudly here, before anything commits:
    * a null-text doc would be counted by n_docs yet emit zero posting
    * rows (posexplode of a null array), silently breaking
    * [[repairStats]]' postings-derivable guarantee. The empty string is
    * fine (it tokenizes to one empty token and gets a posting row). The
    * one-row collect is the null gate's price — the aggregate scan of
    * the batch happens either way, and the row is model-sized. */
  private def statsOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val r = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(TextOps.tokens(col("text"))).cast("long")), lit(0L))
        .as("sum_dl"),
      count(when(col("text").isNull, 1)).as("n_null")).head()
    require(r.getAs[Long]("n_null") == 0L,
      s"${r.getAs[Long]("n_null")} document(s) with NULL text — out of the " +
        "index contract (a null-text doc has no postings, so crash repair " +
        "could not recover its stats); filter or fill them before indexing")
    import spark.implicits._
    Seq((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl")))
      .toDF("n_docs", "sum_dl")
  }

  /** Index a batch of NEW documents: append its postings (range-clustered
    * on term, bloom sidecar on term) and one additive stats row. The
    * first call creates the index; later calls grow it O(delta). Batches
    * must be doc_id-disjoint (see class doc).
    *
    * The two commits are not atomic: a crash between the postings append
    * and the stats row leaves BM25's global factors under-counted (and a
    * blind re-run would double-index the batch). Exactly-once ingest
    * goes through [[indexEpoch]]; after a batch-path crash, run
    * [[repairStats]] and re-index only the batch whose postings are
    * absent. */
  def index(spark: SparkSession, docs: DataFrame, root: String,
            buckets: Int = 8): Int = {
    val stats = statsOf(docs) // eager: the null gate fires pre-commit
    val p = postingsOf(docs)
      .repartitionByRange(buckets, col("term"), col("doc_id"))
      .sortWithinPartitions("term", "doc_id")
    val v = SnapshotStore.appendWithBloom(p, root, "term")
    SnapshotStore.append(stats, statsRoot(root))
    v
  }

  /** Rebuild the corpus-stats store from the postings — the RECOVERY for
    * a crash that landed postings without their stats row ([[index]] /
    * [[deleteDocsWhere]] windows). Stats are fully derivable: every
    * posting row carries its document's `dl`, so n = distinct doc count
    * and Σdl = the distinct (doc, dl) pairs' sum — exact integers,
    * bit-equal to the incrementally maintained values — the ingest-time
    * null-text gate in statsOf is what makes this total: every indexed
    * doc has at least one posting row. One postings scan (O(index)) —
    * the rare-path price of keeping the maintenance paths O(delta).
    * Idempotent, and safe against a LIVE stream's restart: the rebuilt
    * stats publish carrying the POSTINGS store's newest epoch stamp
    * forward (the rebuild already covers every epoch the postings
    * carry), so a torn trigger's replay finds its epoch seen on both
    * stores and no-ops instead of re-appending mass the repair already
    * counted. */
  def repairStats(spark: SparkSession, root: String): Unit = {
    val fromPostings = SnapshotStore.read(spark, root)
      .groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
    val sr = statsRoot(root)
    val covered = (SnapshotStore.lastEpoch(root).toSeq ++
      SnapshotStore.lastEpoch(sr).toSeq).maxOption
    (SnapshotStore.currentVersion(sr), covered) match {
      case (0, Some(e)) => SnapshotStore.appendEpoch(fromPostings, sr, e)
      case (0, None)    => SnapshotStore.append(fromPostings, sr)
      case _ =>
        SnapshotStore.compactWith(fromPostings, sr, targetFiles = 1,
          epochOverride = covered)
    }
  }

  /** Epoch-idempotent [[index]] — the STREAMING ingest hook: postings
    * AND the stats row each publish through their OWN store's
    * [[SnapshotStore.appendEpoch]] guard. Per-store guards are what make
    * the pair crash-convergent: a replayed trigger after a checkpoint
    * restart no-ops whichever halves already committed and lands
    * whichever half the crash cut off (foreachBatch re-delivers the same
    * batch content, so the late stats row is the same row) — one guard
    * spanning both stores would skip the stats append forever when the
    * crash fell between the two commits. The bloom sidecar is written
    * AFTER the commit (pure acceleration: a crash between commit and
    * bloom leaves a correct, conservatively-read version). */
  def indexEpoch(spark: SparkSession, docs: DataFrame, root: String,
                 epochId: Long, buckets: Int = 8): Int = {
    // fully-replayed trigger: both stores stamped — skip at manifest-read
    // cost instead of paying the batch's tokenize+aggregate again (every
    // restart replays the last committed epoch)
    if (SnapshotStore.epochStamped(root, epochId) &&
        SnapshotStore.epochStamped(statsRoot(root), epochId))
      return SnapshotStore.currentVersion(root)
    val stats = statsOf(docs) // eager: the null gate fires pre-commit
    val p = postingsOf(docs)
      .repartitionByRange(buckets, col("term"), col("doc_id"))
      .sortWithinPartitions("term", "doc_id")
    val before = SnapshotStore.currentVersion(root)
    val v = SnapshotStore.appendEpoch(p, root, epochId)
    SnapshotStore.appendEpoch(stats, statsRoot(root), epochId)
    if (v != before) {
      SnapshotStore.writeBloomSidecar(spark, root, v,
        SnapshotStore.manifestDirs(root, v)
          .diff(if (before > 0) SnapshotStore.manifestDirs(root, before)
                else Nil),
        "term")
    }
    v
  }

  /** Index maintenance compaction — the step that restores serving
    * geometry after drip ingest and deletes fragment it: re-range-cluster
    * ALL postings on term into `targetFiles` files (each file again
    * covers one narrow term range), re-bloom the rewrite (CoW'd delete
    * dirs and epoch drips whose sidecars went stale prune again), and
    * fold the stats store's delta rows to ONE row (the stats reduce
    * stays O(1) afterward instead of O(lifetime batches)). Content is
    * untouched — every query answers bit-identically across the
    * compaction (spec-pinned). Same non-commutative commit contract as
    * any store compaction: a concurrent writer fails the rewrite loudly. */
  def compactIndex(spark: SparkSession, root: String,
                   targetFiles: Int = 8): Int = {
    val p = SnapshotStore.read(spark, root)
      .repartitionByRange(targetFiles, col("term"), col("doc_id"))
      .sortWithinPartitions("term", "doc_id")
    val v = SnapshotStore.compactWith(p, root, targetFiles)
    SnapshotStore.writeBloomSidecar(spark, root, v,
      SnapshotStore.manifestDirs(root, v), "term")
    val sr = statsRoot(root)
    SnapshotStore.compactWith(
      SnapshotStore.read(spark, sr).agg(
        coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
        coalesce(sum("sum_dl"), lit(0L)).as("sum_dl")),
      sr, targetFiles = 1)
    v
  }

  /** Union of the bloom-pruned posting reads for `terms` — each term
    * plans its own file set; only files whose bloom can contain the term
    * are opened. */
  def postingsFor(spark: SparkSession, root: String,
                  terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "postingsFor needs at least one term")
    terms.distinct
      .map(t => SnapshotStore.readEq(spark, root, "term", t))
      .reduce(_ unionByName _)
  }

  /** ONE-row (n, sumdl) corpus stats as doubles — the reduce spans
    * O(ingest batches) delta rows, never the corpus. Integer sums are
    * order-exact, so the cast-to-double factors are bit-equal to a
    * single-pass aggregate's. */
  def corpusStats(spark: SparkSession, root: String): DataFrame =
    SnapshotStore.read(spark, statsRoot(root))
      .agg(sum("n_docs").cast("double").as("n"),
        sum("sum_dl").cast("double").as("sumdl"))

  /** BM25 top-`k` served from the index. Identical expression tree (and
    * association order) as `SearchOps.bm25`; each query term gets a slot
    * column so the final score sums per-term contributions in the SAME
    * fixed term order as the scan version's reduceLeft. `terms` must be
    * distinct (duplicate slots would double-count). Absent terms (no
    * postings anywhere) contribute exactly the scan version's +0.0.
    *
    * Scale shape: posting reads are bloom-pruned per term; df comes from
    * counting the in-hand posting rows (exact — a (term,doc) pair exists
    * iff tf>0); the df relation and the one-row stats broadcast; scoring
    * is one aggregate keyed doc_id over only the matched docs; top-k is
    * TakeOrderedAndProject. The corpus is never scanned. */
  def bm25(spark: SparkSession, root: String, terms: Seq[String],
           k: Int = 15, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    RelationalOps.topK(scoredDocs(spark, root, terms, k1, b),
      k, col("score").desc, col("doc_id").asc)

  /** [[bm25]]'s scoring WITHOUT the top-k cut — every matched doc with
    * its score. Factored out so [[topkExcluding]] can anti-join the
    * exclusion set BEFORE ranking (an excluded doc must not consume a
    * top-k slot). Same expression tree, bit-equal scores. */
  private def scoredDocs(spark: SparkSession, root: String,
                         terms: Seq[String], k1: Double,
                         b: Double): DataFrame = {
    require(terms.distinct.size == terms.size, "bm25 terms must be distinct")
    val posts = postingsFor(spark, root, terms)
    val dfs = posts.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    val base = posts
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(corpusStats(spark, root))) // one-row scalar
    val tfd = col("tf").cast("double")
    val idf = ((col("n") - col("df")) + lit(0.5)) / (col("df") + lit(0.5))
    val tfn = (tfd * (lit(k1) + lit(1.0))) /
      (tfd + lit(k1) * ((lit(1.0) - lit(b)) +
        lit(b) * col("dl").cast("double") / (col("sumdl") / col("n"))))
    val slotted = base.select(col("doc_id"), col("term"),
      (idf * tfn).as("contrib"))
    val slots = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("contrib"))).as(s"c$i")
    }
    val per = slotted.groupBy("doc_id").agg(slots.head, slots.tail: _*)
    val score = terms.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduceLeft(_ + _)
    per.select(col("doc_id"), score.as("score")).where(col("score") > 0)
  }

  /** Ranked AND-NOT retrieval — "matching any of `terms`, excluding
    * documents containing ANY of `exclude`" as ONE served query (the
    * routine curation filter that previously took a client-side
    * anti-join against a second query). The exclusion set is the union
    * of the excluded terms' bloom-pruned postings (distinct doc_ids),
    * anti-joined BEFORE the top-k cut so excluded docs never consume a
    * rank slot. Cost: O(postings of terms ∪ exclude), corpus never
    * scanned; scores bit-equal to [[bm25]] on the surviving docs. */
  def topkExcluding(spark: SparkSession, root: String, terms: Seq[String],
                    exclude: Seq[String], k: Int = 15, k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    require(exclude.nonEmpty, "topkExcluding needs exclusion terms — " +
      "use topkAny for a plain ranked OR")
    val ex = postingsFor(spark, root, exclude)
      .select(col("doc_id")).distinct()
    val kept = scoredDocs(spark, root, terms, k1, b)
      .join(ex, Seq("doc_id"), "left_anti")
    ranked(RelationalOps.topK(kept, k, col("score").desc, col("doc_id").asc))
  }

  /** ONE definition of "attach the explicit rank" over an in-hand top-k
    * frame (≤ k rows — the unpartitioned window is deliberate), shared
    * by [[topkAny]] and [[topkExcluding]] so the tie-break can never
    * drift between them (score DESC, doc_id ASC, matching topK's total
    * order). */
  private def ranked(topk: DataFrame): DataFrame =
    topk.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id").asc)))

  /** Ranked DISJUNCTIVE (OR) retrieval — the actual retrieval shape:
    * top-`k` documents scored by BM25 over whichever of `terms` they
    * contain, with the rank EXPLICIT in the output and the tie-break
    * deterministic (score DESC, doc_id ASC — the same total order
    * [[bm25]]'s topK uses, so rank is reproducible across engines given
    * bit-equal scores, which the shared expression tree guarantees).
    * Serving cost is [[bm25]]'s: union of the query terms' bloom-pruned
    * postings, O(postings of the queried terms), corpus never scanned;
    * the rank window runs over ≤ k in-hand rows. Without this, a caller
    * wanting ranked results had to over-fetch and re-sort client-side. */
  def topkAny(spark: SparkSession, root: String, terms: Seq[String],
              k: Int = 15, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    ranked(bm25(spark, root, terms, k, k1, b))

  /** Documents containing the exact token PHRASE, with occurrence
    * counts — the strict decontamination probe (an n-gram verbatim-match
    * lookup) served positionally from the index: each phrase word's
    * bloom-pruned postings explode to (doc, pos − i) anchors, and a
    * phrase occurrence is an anchor present in ALL word legs (a
    * (doc, anchor) equi-join count — overlapping occurrences count,
    * repeated words in the phrase work because each leg explodes its
    * own positions). O(postings of the phrase words), corpus never
    * scanned.
    *
    * @return (doc_id, nhits) for docs with ≥1 occurrence */
  def containingPhrase(spark: SparkSession, root: String,
                       phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "containingPhrase needs a non-empty phrase")
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      SnapshotStore.readEq(spark, root, "term", t)
        .select(col("doc_id"), explode(col("pos")).as("p"))
        .select(col("doc_id"), (col("p") - lit(i)).as("anchor"))
    }
    legs
      .reduce((a, b) => a.join(b, Seq("doc_id", "anchor")))
      .groupBy("doc_id").agg(count(lit(1)).as("nhits"))
  }

  /** Delete documents from the index — the right-to-be-forgotten hook
    * propagated to the serving artifact: postings CoW-delete through the
    * store (only owning directories rewrite) and ONE negative stats row
    * re-centers BM25's global factors, so post-delete scores are
    * BIT-EQUAL to an index rebuilt on the surviving corpus (integer
    * decrements are exact; `dl` rides on every posting row, so the
    * departing token mass is recovered from the index itself — the
    * deleted text is not needed). Directories the CoW rewrite produces
    * carry no bloom rows, so lookups conservatively keep them until the
    * next indexing maintenance — pruning degrades, correctness never.
    *
    * The delete and the stats decrement are two commits: a crash
    * between them leaves the stats over-counted, and a RE-RUN cannot
    * recover it (the postings are already gone, so the recomputed
    * decrement is zero) — run [[repairStats]] after a crashed delete.
    *
    * `cond` must reference ONLY `doc_id` — enforced, not just documented:
    * the predicate evaluates against POSTING rows, so a condition on
    * `term`/`tf`/`dl` would delete a doc's matching postings yet decrement
    * the stats by the doc's FULL dl and whole-doc count, silently skewing
    * BM25's global factors (partial-document deletion is out of the index
    * contract — see the class doc). */
  def deleteDocsWhere(spark: SparkSession, root: String,
                      cond: org.apache.spark.sql.Column): Unit = {
    // gate on the RESOLVED condition: an unresolved tree reports
    // deterministic == true for any function (UnresolvedFunction doesn't
    // know what it names yet — empirically, 'rand() passes), so the
    // predicate is analyzed against the store before any contract check
    val resolvedCond = SnapshotStore.read(spark, root).where(cond)
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }.getOrElse(sys.error(
        "deleteDocsWhere: analyzed plan carries no Filter — cannot gate the predicate"))
    val refs = resolvedCond.references.toSeq.map(_.name)
    // the stats decrement and the CoW rewrite evaluate cond SEPARATELY —
    // a nondeterministic predicate (rand(), partition id, input file)
    // would retract different stats than the rows it deletes
    require(resolvedCond.deterministic,
      "deleteDocsWhere needs a deterministic predicate — the stats " +
        "decrement and the postings rewrite each evaluate it")
    // reference-free predicates are legal only when FOLDABLE (true
    // literals — lit(true) = delete-all selects whole documents by
    // definition); a ref-free but row-varying expression is still a
    // posting-row predicate in disguise
    require(refs.forall(_.equalsIgnoreCase("doc_id")) &&
        (refs.nonEmpty || resolvedCond.foldable),
      s"deleteDocsWhere is doc-level: cond may reference only doc_id, got " +
        s"columns ${refs.distinct.mkString("[", ", ", "]")} — a posting-row " +
        "predicate would desynchronize the corpus stats")
    val gone = SnapshotStore.read(spark, root).where(cond)
      .groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), // negated below; 0-row delete → (0,0)
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .select((-col("n_docs")).as("n_docs"), (-col("sum_dl")).as("sum_dl"))
      .localCheckpoint(true) // pin BEFORE the postings rewrite below
    SnapshotStore.deleteWhere(spark, root, cond)
    SnapshotStore.append(gone, statsRoot(root))
  }

  /** IN-PLACE document re-index — the update path that was previously
    * out of contract ("updates go through rebuild"): replace the indexed
    * postings and stats of `docs`' doc_ids with their NEW text, under
    * ONE epoch so a crash anywhere in the window converges on replay.
    * Also inserts doc_ids not yet indexed (upsert semantics). The final
    * index is BIT-EQUAL to a from-scratch rebuild of the updated corpus
    * (oracle- and spec-pinned).
    *
    * Crash convergence, step by step (replay = foreachBatch re-delivers
    * the SAME batch for the same epoch):
    *   1. the net stats delta (new − old token mass) is STAGED to a
    *      sidecar via write-temp + atomic move, keyed by epoch, BEFORE
    *      anything mutates — replays reuse it, because after step 2 the
    *      old postings (the only other source of the old dl) are gone;
    *   2. the old postings CoW-delete — naturally idempotent (deleting
    *      absent rows is a no-op), so it needs no stamp of its own;
    *   3. the new postings append under the postings store's epoch guard
    *      (a replay that finds the stamp skips 2 and 3 — the delete
    *      cannot have "half happened" after the append committed, the
    *      two publish in order);
    *   4. the stats delta appends under the stats store's epoch guard.
    *
    * The batch's doc_id set drives the delete predicate through the
    * driver (model-sized by contract: a reindex batch is a trigger's
    * worth of updated documents, not a corpus — corpus-scale rewrites
    * go through rebuild). Stage reuse is sound under the store's
    * single-writer contract: a FOREIGN mutation (e.g. deleteDocsWhere)
    * interleaved between a crash and its replay could stale the staged
    * delta — don't run other writers against an index whose stream is
    * mid-recovery. `crashAfter` is test machinery: n ∈ 1..3 aborts
    * after step n so the spec can replay every window. */
  def reindexEpoch(spark: SparkSession, docs: DataFrame, root: String,
                   epochId: Long, buckets: Int = 8): Int =
    reindexEpochInternal(spark, docs, root, epochId, buckets, crashAfter = 99)

  private[graft] def reindexEpochInternal(spark: SparkSession,
                                          docs: DataFrame, root: String,
                                          epochId: Long, buckets: Int,
                                          crashAfter: Int): Int = {
    val sr = statsRoot(root)
    require(SnapshotStore.currentVersion(root) > 0,
      s"no index at $root — reindex updates an existing index; use index/indexEpoch to create")
    if (SnapshotStore.epochStamped(root, epochId) &&
        SnapshotStore.epochStamped(sr, epochId))
      return SnapshotStore.currentVersion(root)
    val stageDir = java.nio.file.Paths.get(root, "_reindex")
    val stage = stageDir.resolve(s"epoch_$epochId.json")
    val postingsStamped = SnapshotStore.epochStamped(root, epochId)
    val (nd, sd) =
      if (java.nio.file.Files.exists(stage)) {
        // a replay reuses the staged delta — post-delete the old token
        // mass is unrecoverable from the index
        val t = new String(java.nio.file.Files.readAllBytes(stage), "UTF-8")
        val m = """\{"nd":\s*(-?\d+),\s*"sd":\s*(-?\d+)\}""".r
          .findFirstMatchIn(t).getOrElse(sys.error(
            s"malformed reindex stage file $stage"))
        (m.group(1).toLong, m.group(2).toLong)
      } else {
        require(!postingsStamped,
          s"postings at $root carry epoch $epochId but no stage file — " +
            "a foreign epoch chain? refuse rather than guess the stats")
        val newS = statsOf(docs).head() // null gate fires here, pre-commit
        val ids = docs.select("doc_id").distinct()
        val old = SnapshotStore.read(spark, root)
          .join(broadcast(ids), "doc_id") // model-sized batch contract
          .groupBy("doc_id").agg(max(col("dl")).as("dl"))
          .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("s"))
          .head()
        val d = (newS.getAs[Long]("n_docs") - old.getAs[Long]("n"),
          newS.getAs[Long]("sum_dl") - old.getAs[Long]("s"))
        java.nio.file.Files.createDirectories(stageDir)
        val tmp = stageDir.resolve(s"epoch_$epochId.json.tmp")
        java.nio.file.Files.write(tmp,
          s"""{"nd": ${d._1}, "sd": ${d._2}}""".getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, stage,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        d
      }
    require(crashAfter > 1, "test crash: after staging")
    if (!postingsStamped) {
      val idList = docs.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSeq // model-sized batch contract
      if (idList.nonEmpty)
        SnapshotStore.deleteWhere(spark, root,
          col("doc_id").isin(idList: _*))
      require(crashAfter > 2, "test crash: after delete")
      val p = postingsOf(docs)
        .repartitionByRange(buckets, col("term"), col("doc_id"))
        .sortWithinPartitions("term", "doc_id")
      val before = SnapshotStore.currentVersion(root)
      val v = SnapshotStore.appendEpoch(p, root, epochId)
      if (v != before)
        SnapshotStore.writeBloomSidecar(spark, root, v,
          SnapshotStore.manifestDirs(root, v)
            .diff(SnapshotStore.manifestDirs(root, before)), "term")
    }
    require(crashAfter > 3, "test crash: after postings append")
    val spark2 = spark
    import spark2.implicits._
    SnapshotStore.appendEpoch(Seq((nd, sd)).toDF("n_docs", "sum_dl"),
      sr, epochId)
    // both stores stamped: the stage has served its purpose — delete it
    // so stages accumulate only for epochs that crashed mid-window (a
    // crash between the stamp and this delete leaves one orphan; the
    // fully-stamped replay early-returns without reading it)
    java.nio.file.Files.deleteIfExists(stage)
    SnapshotStore.currentVersion(root)
  }

  /** Documents containing ALL of `terms` — the decontamination /
    * exact-containment probe served from the index: intersect the
    * bloom-pruned posting sets by counting distinct term hits per doc
    * (posting rows are unique per (term, doc), so a plain count suffices).
    * O(postings of the rarest-to-commonest queried terms), corpus never
    * scanned. */
  def containingAll(spark: SparkSession, root: String,
                    terms: Seq[String]): DataFrame = {
    val want = terms.distinct
    postingsFor(spark, root, want)
      .groupBy("doc_id").agg(count(lit(1)).as("nt"))
      .where(col("nt") === want.size)
      .select("doc_id")
  }
}
