package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-curation operators: deterministic splits and stratified sampling
  * — the selection stage of a training-data pipeline. */
object CurationOps {

  /** Content-hash train/eval split (see [[TextOps.splitTag]]): stable across
    * runs, engines, and partitionings — re-ingesting the same document
    * always lands it in the same split. */
  def withSplit(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("split", TextOps.splitTag(col(textCol)))

  /** Leakage-safe train/eval split: assignment is keyed by the document's
    * near-dup CLUSTER, not its own content — every member of a connected
    * near-dup component lands in the SAME split, so a train document can
    * never have an eval near-twin (the contamination [[withSplit]] cannot
    * rule out: two near-identical texts hash to independent splits).
    * `labels` is a `(doc_id, label)` relation from
    * [[DedupOps.nearDupGroups]]; unlabeled documents (no near-dup edge)
    * fall back to their own id — singleton clusters. Same md5-threshold
    * arithmetic as [[TextOps.splitTag]], over the group key.
    *
    * Scale shape: one broadcast-or-shuffled equi-join onto the labels
    * (labels are one row per CLUSTERED doc, a small fraction of the
    * corpus) and a map-side hash — the split itself adds no new
    * all-pairs work beyond the dedup pipeline that produced the labels. */
  def leakageSafeSplit(docs: DataFrame, labels: DataFrame,
                       trainHexCeiling: String = "e6"): DataFrame =
    docs
      .join(labels.select(col("doc_id"), col("label")), Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("label"), col("doc_id")))
      .withColumn("split",
        when(md5(col("grp").cast("string")) < trainHexCeiling, lit("train"))
          .otherwise(lit("eval")))
      .drop("label")

  /** Seeded stratified sample per stratum value (e.g. language balance):
    * keep a row iff the first 4 hex digits of `md5("<seed>:<key>")` fall
    * below `floor(fraction · 16^4)` for its stratum. A per-row filter — no
    * shuffle, no driver collection, no RNG state: the same (seed, key)
    * always makes the same decision regardless of run, engine, or
    * partitioning (content-hash sampling, same contract as [[withSplit]]),
    * so the op is exactly reproducible in ANSI SQL for the oracle.
    * Fraction granularity is 1/65536; fraction >= 1 keeps everything. */
  def stratifiedSample(df: DataFrame, stratum: String,
                       fractions: Map[String, Double], seed: Long,
                       keyCol: String = "doc_id"): DataFrame = {
    val hex = substring(md5(concat_ws(":", lit(seed), col(keyCol))), 1, 4)
    val thresh = fractions.foldLeft(lit(null).cast("string")) { case (acc, (k, f)) =>
      // Both bounds guarded: f >= 1 keeps all; f <= 0 must keep NONE —
      // %04x on a negative Int renders 8 two's-complement chars whose
      // 4-char prefix is near-"ffff", which would silently flip the
      // stratum to keep-everything (same trap [[ppsSample]] guards).
      val t = if (f >= 1.0) "g000" // beyond any hex digit — keep all
              else if (f <= 0.0) "0000" // below any hex digit — keep none
              else f"${math.floor(f * 65536).toInt}%04x"
      when(col(stratum) === k, lit(t)).otherwise(acc)
    }
    df.where(thresh.isNotNull && hex < thresh)
  }

  /** Deterministic probability-proportional-to-size sampling: keep a row
    * with probability `baseFraction · weight / refWeight` (clamped to 1) —
    * the source-weighting stage of a corpus build (upsample long/high-
    * quality documents, downsample boilerplate). The coin is the same
    * content-hash construction as [[stratifiedSample]]: the first 4 md5
    * hex digits of `(seed:key)` against a per-ROW threshold, so the
    * decision is reproducible across runs, engines, and partitionings, and
    * exactly replicable in ANSI SQL. Probability granularity 1/65536;
    * per-row probability ≥ 1 keeps the row unconditionally and ≤ 0 (zero
    * or negative weight) never keeps it — both bounds are guarded
    * explicitly because `hex()` of an out-of-[0,65536) long does not
    * produce a comparable 4-hex-digit threshold (negative longs render as
    * 16 two's-complement chars that lpad would TRUNCATE to a near-"ffff"
    * prefix, silently flipping the probability to ~1). */
  def ppsSample(df: DataFrame, weightCol: String, refWeight: Double,
                baseFraction: Double, seed: Long,
                keyCol: String = "doc_id"): DataFrame = {
    val hexv = substring(md5(concat_ws(":", lit(seed), col(keyCol))), 1, 4)
    val n = floor(lit(baseFraction) * (col(weightCol).cast("double") / lit(refWeight)) *
      65536).cast("long")
    df.where(n >= 65536 || (n > 0 && hexv < lower(lpad(hex(n), 4, "0"))))
  }

  /** Temperature-flattened group mixture (τ = 1/2): keep a row of group g
    * with probability `min(1, sqrt(refCount / n_g))` — the standard
    * inverse-power flattening of a skewed source/language mix (groups at or
    * below `refCount` survive whole; a group 4× the reference is halved,
    * 100× is cut to a tenth). Expected kept size per oversized group is
    * `sqrt(refCount · n_g)`, the τ = 1/2 temperature curve.
    *
    * Determinism: `refCount / n_g` is an exact-integer double division,
    * `sqrt` is IEEE correctly rounded, and the keep decision reuses the
    * [[ppsSample]] content-hash coin against `floor(p · 65536)` — floor of
    * a bit-identical double is bit-identical (no rounding-tie surface), so
    * the sample is reproducible across runs, engines, and partitionings.
    * No cross-group normalization sum (that would be an order-dependent
    * double accumulation); the reference count is an explicit parameter,
    * as a corpus build wants it pinned anyway. Scale shape: one tiny
    * group-count aggregate broadcast back; the fact table never shuffles. */
  def temperatureSample(docs: DataFrame, groupCol: String, refCount: Long,
                        seed: Long, keyCol: String = "doc_id"): DataFrame = {
    require(refCount > 0, s"refCount must be positive, got $refCount")
    // Null-safe group match: groupBy counts a NULL group like any other,
    // and <=> keeps its rows in the sample (a plain equi-join would
    // silently drop every untagged-group row regardless of the coin).
    val counts = docs.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
    val withP = docs.join(broadcast(counts), col(groupCol) <=> col("__g"))
      .drop("__g")
      .withColumn("__p",
        sqrt(lit(refCount).cast("double") / col("__n").cast("double")))
    ppsSample(withP, "__p", refWeight = 1.0, baseFraction = 1.0,
        seed = seed, keyCol = keyCol)
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-group document quota (e.g. cap any one domain/source at `k` docs —
    * the domain-balance stage of a corpus build). Selection order inside a
    * group is the content hash (then the key for ties), so WHICH k docs
    * survive is deterministic and engine-independent, not an artifact of
    * scan order. One shuffle on the group column; the per-group sort is
    * bounded by the group size, and a rank ≤ k predicate over a window is
    * AQE/skew-friendly (no driver involvement).
    *
    * Output contract: the input columns plus `rk` (1-based selection rank
    * within the group — deliberately kept, callers use it for quota
    * reporting). Inputs that already carry an `rk` column are overwritten.
    */
  def quotaPerGroup(docs: DataFrame, group: String, k: Int,
                    textCol: String = "text", keyCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(md5(col(textCol)), col(keyCol))
    docs.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Sequence packing: assign every document a position in a fixed-capacity
    * token stream — the concat-and-chunk layout an LLM training run reads
    * (documents are concatenated per group and the stream is cut into
    * `capacityTokens` chunks; a doc's `bin` is the chunk where it starts).
    *
    * The stream order inside a group is doc_id, and grouping is
    * `doc_id % nGroups` — both reproducible in ANSI SQL, so the whole
    * layout is oracle-checkable. Scale shape: the running offset is a
    * windowed sum PARTITIONED by group (never a global single-task
    * order-by); `nGroups` is the writer parallelism — at cluster scale one
    * group ≈ one output shard stream.
    *
    * @return (doc_id, grp, bin, start_offset, n_tokens)
    */
  def packSequences(docs: DataFrame, capacityTokens: Long = 2048L,
                    nGroups: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(nGroups.toLong)).as("grp"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("grp"),
        floor(col("start_offset") / lit(capacityTokens)).as("bin"),
        col("start_offset"), col("n_tokens"))
  }

  /** Materialize the [[packSequences]] layout: one parquet dataset
    * partitioned by (grp, bin), i.e. one directory per training chunk —
    * the shard layout a training job reads sequentially. The pack plan
    * carries only (doc_id, offsets); text re-attaches via an equi-join on
    * doc_id, and the write partitions by the pack keys so a chunk's docs
    * are co-located. At cluster scale `nGroups` is the writer parallelism. */
  def writePackedShards(docs: DataFrame, outDir: String,
                        capacityTokens: Long = 2048L, nGroups: Int = 8): Unit =
    packSequences(docs, capacityTokens, nGroups)
      .join(docs, "doc_id")
      .write.mode("overwrite").partitionBy("grp", "bin").parquet(outDir)

  /** Overlapping token-window chunking — the context-window prep every
    * RAG / pretraining pipeline runs between curation and tokenization:
    * each document becomes `ceil(max(n−window,0)/stride)+1` chunks of at
    * most `window` whitespace tokens, consecutive chunks overlapping by
    * `window − stride`. The FINAL start clamps to `n − window` so the tail
    * is always covered by a full-width chunk (never a fragment shorter
    * than `window` unless the whole document is) and no start repeats —
    * the deterministic convention, mirrored exactly by the `text_chunk`
    * oracle in integer arithmetic on both engines.
    *
    * Whole plan is built-in codegen array functions over one projection —
    * map-only, no shuffle, no UDF: at 100 TB this is a pure scan-transform
    * whose output size is input × (window/stride) by construction. */
  def chunkDocuments(docs: DataFrame, window: Int = 64,
                     stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = filter(TextOps.tokens(col("text")), t => t =!= "")
    docs
      .select(col("doc_id"), toks.as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      // last chunk index = ceil(max(n-window,0)/stride), in integer math
      .withColumn("starts",
        transform(
          sequence(lit(0L),
            expr(s"(GREATEST(n - $window, 0) + ${stride - 1}) DIV $stride")),
          i => least(i * lit(stride.toLong), greatest(col("n") - window, lit(0L)))))
      .select(col("doc_id"), col("w"), col("n"),
        posexplode(col("starts")).as(Seq("chunk_idx", "begin_token")))
      .select(
        col("doc_id"), col("chunk_idx"), col("begin_token"),
        least(lit(window.toLong), col("n") - col("begin_token")).as("n_tokens"),
        array_join(
          slice(col("w"), col("begin_token").cast("int") + 1,
            least(lit(window), (col("n") - col("begin_token")).cast("int"))),
          " ").as("chunk_text"))
  }

  /** Train/eval decontamination: train-split documents sharing at least one
    * word `n`-gram with any eval-split document (the standard benchmark-
    * overlap check run before training). Both sides explode to DISTINCT
    * per-doc n-grams; the eval gram set is deduplicated and the overlap is
    * a single equi-join on the gram — never a doc×doc comparison. Returns
    * (doc_id, n_shared_grams) per contaminated train doc.
    */
  def decontaminate(docs: DataFrame, n: Int = 8): DataFrame = {
    val grams = withSplit(docs).select(
      col("split"), col("doc_id"),
      explode(array_distinct(
        graft.functions.TextExpressions.wordShingles(TextOps.tokens(col("text")), n))).as("gram"))
    val evalGrams = grams.where(col("split") === "eval").select("gram").distinct()
    grams.where(col("split") === "train")
      .join(evalGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Percentile length filter: keep documents whose token count lies in
    * the corpus' [lo, hi] exact-percentile band — the outlier-length
    * screen (truncated boilerplate, concatenation accidents) a curation
    * pipeline runs before quality scoring. EXACT percentiles (Spark
    * `percentile`, bit-matching `quantile_cont` — the proven a10
    * contract), computed in ONE tiny aggregate that broadcasts into a
    * map-side filter: the corpus never shuffles.
    *
    * @return (doc_id, n_tokens) for surviving documents
    */
  def lengthFilter(docs: DataFrame, lo: Double = 0.1, hi: Double = 0.9): DataFrame = {
    val counted = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val bounds = counted.agg(
      expr(s"percentile(n_tokens, $lo)").as("lo"),
      expr(s"percentile(n_tokens, $hi)").as("hi"))
    counted.crossJoin(broadcast(bounds))
      .where(col("n_tokens") >= col("lo") && col("n_tokens") <= col("hi"))
      .select("doc_id", "n_tokens")
  }

  /** Frequency vocabulary over whitespace tokens: the top `maxSize` tokens
    * by (count DESC, token ASC) — a total order, so the vocabulary and the
    * ids it assigns are deterministic across runs and engines. One
    * token-keyed agg shuffle; the ranking window runs on the MODEL-sized
    * result (≤ maxSize rows), not the corpus.
    *
    * @return (token_id, tok, n) with token_id = 0-based rank
    */
  def buildVocab(docs: DataFrame, maxSize: Int = 1 << 15): DataFrame =
    RelationalOps.topK(
        docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n")),
        maxSize, col("n").desc, col("tok").asc)
      .withColumn("token_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("tok").asc)).cast("long") - 1)
      .select("token_id", "tok", "n")

  /** Encode documents to token-id sequences against a fitted vocabulary
    * (the text → ids step a training pipeline runs before
    * [[packSequences]]). The vocabulary is MODEL-sized, so it ships as one
    * map literal and the encode is a per-row `transform` — map-only at any
    * corpus scale, no explode, no join, no shuffle. Unknown tokens map to
    * `oovId`.
    *
    * @return (doc_id, n_tokens, token_ids array<long>)
    */
  def encodeTokens(docs: DataFrame, vocab: Map[String, Long],
                   oovId: Long = -1L): DataFrame = {
    val vmap = typedLit(vocab)
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        transform(col("toks"),
          t => coalesce(element_at(vmap, t), lit(oovId))).as("token_ids"))
  }

  /** Duplicated-passage REMOVAL (the C4/deduplicated-corpus cleanup step —
    * `text_dup_spans` detects cross-doc duplicated n-grams, this strips
    * them): every token covered by any occurrence of an n-gram that
    * appears in >= 2 distinct documents is dropped; survivors rejoin in
    * position order. Documents shorter than `n` tokens shingle to their
    * whole text (the [[graft.functions.TextExpressions.WordShingles]]
    * fallback), so an exact short duplicate strips entirely.
    *
    * Scale shape: the ONLY data-sized stage is the gram explode + its
    * gram-keyed duplicate shuffle. Duplicated-occurrence START positions
    * then aggregate to one small array per affected doc, join back keyed
    * by doc_id, and the strip itself is per-row ARRAY arithmetic (expand
    * starts to a covered-position set, filter tokens by index, rejoin) —
    * the token stream is never exploded, never shuffled. Never doc × doc.
    *
    * @return (doc_id, n_tokens, n_kept, clean_text) — one row per input doc
    */
  def stripDupSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    val grams = docs
      .select(col("doc_id"),
        posexplode(graft.functions.TextExpressions.wordShingles(
          TextOps.tokens(col("text")), n)))
      .toDF("doc_id", "start", "gram")
    val dup = grams.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select("gram")
    // per affected doc: the start positions of its duplicated-gram
    // occurrences — a SMALL array (bounded by the doc's gram count)
    val dupStarts = grams.join(dup, "gram")
      .groupBy("doc_id").agg(collect_list(col("start")).as("starts"))
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        // covered = union of [start, start + n) per occurrence, capped at
        // the doc end — the cap only binds for the short-doc whole-text
        // shingle fallback (full shingles never reach past the end)
        array_distinct(flatten(transform(
          coalesce(col("starts"), array().cast("array<int>")),
          s => sequence(s, least(s + n - 1, size(col("toks")) - 1)))))
          .as("cov"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("cov"))).cast("long").as("n_kept"),
        concat_ws(" ",
          filter(col("toks"), (_, i) => !array_contains(col("cov"), i)))
          .as("clean_text"))
  }

  /** Deterministic corpus shuffle as a SHARDED layout — the
    * training-order randomization stage: every doc gets a content-hash
    * position (`md5("<seed>#<doc_id>")`), its shard is the hash modulo
    * `nShards`, and its in-shard position is the hash order. Reading the
    * shards (in any order, each sequentially) yields a reproducible
    * pseudo-random permutation of the corpus.
    *
    * Scale shape — deliberately NOT a global sort/row_number: shard
    * assignment is map-side, and the rank window partitions by shard, so
    * parallelism is `nShards` with ~|corpus|/nShards rows per task. A
    * global permutation INDEX would serialize on one ordering task;
    * shard + in-shard position is the layout training loaders actually
    * consume. Re-sharding with a different seed is one more map+window
    * pass.
    *
    * @return (doc_id, shard, shard_pos) */
  def shuffleShards(docs: DataFrame, nShards: Int, seed: Long = 42L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // 15 hex digits = 60 bits: fits a Long exactly, parses identically in
    // ANSI SQL (CAST('0x…' AS BIGINT)) — the cross-engine numeric-hash
    // contract (md5 itself is the proven dataset_split construction).
    val key = md5(concat_ws("#", lit(seed.toString), col("doc_id").cast("string")))
    val h = conv(substring(col("__key"), 1, 15), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__key"), col("doc_id"))
    docs.select(col("doc_id"), key.as("__key"))
      .withColumn("shard", pmod(h, lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "shard_pos")
  }
}
