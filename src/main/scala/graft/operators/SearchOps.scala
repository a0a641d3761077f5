package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the corpus: BM25 scoring for a fixed term
  * set — the "find the best training examples for X" query shape.
  *
  * The score is the standard BM25 form with the log dropped from the IDF
  * term (a monotone transform per term, so single-term rankings are
  * unchanged and multi-term rankings weight rarity more aggressively):
  *
  *   score(d) = Σ_t  ((N - df_t) + 0.5) / (df_t + 0.5)
  *              · tf · (k1 + 1) / (tf + k1 · (1 - b + b · dl / avgdl))
  *
  * Log-free keeps every factor a rational function of exact integer counts
  * — each IEEE multiply/divide is deterministic, so the whole score is
  * bit-reproducible in ANSI SQL for the oracle (ln/log are library calls
  * with no cross-engine bit guarantee; +0.5 terms also make df = N safe).
  *
  * Scale shape: one pass computes per-doc term frequencies map-side
  * (`size(tokens) - size(array_remove(tokens, term))` — codegen'd
  * collection ops, no explode); ONE single-row aggregate produces
  * (N, Σdl, df_t...) and is broadcast back; scoring is map-only; the
  * top-k is TakeOrderedAndProject. Nothing shuffles the corpus.
  */
object SearchOps {

  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 15,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val toks = TextOps.tokens(col("text"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      (size(toks) - size(array_remove(toks, lit(t)))).cast("double").as(s"tf$i")
    }
    val perDoc = docs.select(
      col("doc_id") +: size(toks).cast("double").as("dl") +: tfCols: _*)

    val statCols =
      count(lit(1)).cast("double").as("n") +:
      sum(col("dl").cast("long")).cast("double").as("sumdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)

    // Every factor below is written with explicit parentheses and the same
    // association order as the oracle SQL — IEEE ops are deterministic only
    // if both engines evaluate the identical expression tree.
    def contrib(i: Int): Column = {
      val idf = ((col("n") - col(s"df$i")) + lit(0.5)) / (col(s"df$i") + lit(0.5))
      val tfn = (col(s"tf$i") * (lit(k1) + lit(1.0))) /
        (col(s"tf$i") + lit(k1) * ((lit(1.0) - lit(b)) +
          lit(b) * col("dl") / (col("sumdl") / col("n"))))
      idf * tfn
    }
    val score = terms.indices.map(contrib).reduceLeft(_ + _)

    RelationalOps.topK(
      perDoc.crossJoin(broadcast(stats))
        .select(col("doc_id"), score.as("score"))
        .where(col("score") > 0),
      k, col("score").desc, col("doc_id").asc)
  }

  /** Top-`k` TF-IDF keywords per document — the corpus-wide keyword /
    * topic-signal extraction stage. Log-free IDF (tf · N / df): a single
    * exact-integer product followed by ONE double division keeps the score
    * bit-reproducible in ANSI SQL (same rationale as [[bm25]]).
    *
    * Scale shape: explode → (doc, term) count → term doc-frequency — two
    * aggregate shuffles keyed by (doc_id, term) and (term); the corpus
    * total is a broadcast scalar; the per-doc rank partitions by doc_id.
    * No global sort, nothing collects.
    *
    * @return (doc_id, rk, term, score)
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, term), so doc frequency is a plain
    // count — no countDistinct Expand.
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n"))
    val scored = tf
      .join(df_, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("term"),
        ((col("tf") * col("n")).cast("double") / col("df").cast("double"))
          .as("score"))
    RelationalOps.topNPerGroup(scored, k,
        Seq(col("doc_id")), Seq(col("score").desc, col("term").asc))
      .select(col("doc_id"), col("rk"), col("term"), col("score"))
  }

  /** Corpus bigram language-model scoring — the perplexity-filter analog
    * of pretraining curation (KenLM-style fluency gates), made
    * engine-exact: the model is the corpus' own bigram/unigram count
    * tables, each bigram scores the add-one-smoothed RATIONAL
    * `(c(w₁w₂)+1) / (c(w₁)+V)` (two integers, one double division —
    * deterministic in every engine), and a document's score is the
    * exact-decimal mean over its bigrams. No logs, no exp — the monotone
    * map to log-perplexity is the caller's, off the comparison surface.
    *
    * Documents with fewer than two tokens have no bigrams and emit no
    * row (the length gate upstream owns them).
    *
    * Scale shape: token and bigram counts are two explode + map-side-
    * combined aggregates; scoring joins the doc's bigram stream against
    * the two count relations (shuffle equi-joins on `bg` / `w1` — the
    * count tables are vocabulary-sized, usually broadcastable after a
    * frequency floor) and reduces per doc_id. Nothing collects but the
    * scalar V.
    *
    * @return (doc_id, lm_score, n_bigrams)
    */
  def bigramLmScores(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
    val n = size(col("w"))
    // Spark's sequence(1, 0) DESCENDS rather than being empty, so the
    // short-doc case needs the explicit guard (the oracle's
    // generate_series(1, 0) is empty and matches the `otherwise`).
    val pairs = w.select(col("doc_id"),
        explode(when(n >= 2, transform(sequence(lit(1), n - 1),
            i => struct(
              element_at(col("w"), i).as("w1"),
              concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))
                .as("bg"))))
          .otherwise(typedlit(Seq.empty[(String, String)])
            .cast("array<struct<w1:string,bg:string>>"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    val uni = w.select(explode(col("w")).as("tkn"))
      .groupBy("tkn").agg(count(lit(1)).as("c1"))
    val vocab = uni.count()
    val bg = pairs.groupBy("bg").agg(count(lit(1)).as("c2"))
    pairs
      .join(bg, "bg")
      .join(uni, pairs("w1") === uni("tkn"))
      .select(col("doc_id"),
        ((col("c2") + 1).cast("double") /
          (col("c1") + lit(vocab)).cast("double")).as("p"))
      .groupBy("doc_id")
      .agg(
        (sum(col("p").cast("decimal(28,12)")).cast("double") /
          count(lit(1)).cast("double")).as("lm_score"),
        count(lit(1)).as("n_bigrams"))
  }
}
