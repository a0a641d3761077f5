package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich et al.
  * 2016, the subword algorithm under every production LLM tokenizer) —
  * the learned counterpart of [[CurationOps]]' frequency vocab: instead
  * of fixing the token set, iteratively merge the most frequent adjacent
  * symbol pair until `numMerges` rules exist, then encode text by
  * replaying the rules in order.
  *
  * The classic scaling insight makes this distributed-cheap: training
  * never touches the corpus after ONE pass — it operates on the
  * word-frequency table (vocab-sized, each word weighted by its corpus
  * count), so an iteration is an explode→sum over a few thousand rows
  * plus a ONE-ROW argmax collect (the GD/k-means model-sized-collect
  * posture). At 100 TB the corpus pass is the only big job; the merge
  * loop costs the same as at 100 MB.
  *
  * Determinism is the whole design: a word's symbol state is a STRING of
  * `\u0001`-delimited symbols (`␁c␁␁a␁␁t␁`), and applying merge (a, b)
  * is a LITERAL leftmost-nonoverlapping `replace` of `␁a␁␁b␁` with
  * `␁ab␁` — the delimiter makes cross-symbol false matches impossible
  * and sequential literal replace behaves identically in every engine,
  * so the DuckDB oracle can replay the ENTIRE training run (apply the
  * exported merges step by step via a recursive CTE, recompute each
  * step's pair counts, and check every exported rule was that step's
  * argmax under the (freq desc, lhs asc, rhs asc) tie-break).
  * Overlapping runs (`aaa` + rule (a,a)) merge leftmost-greedy — the
  * standard BPE behavior, and bit-identical on both sides.
  */
object BpeOps {

  // A corpus token CONTAINING the delimiter would corrupt symbol states
  // (phantom empty symbols, rules whose search string matches unrelated
  // positions) - such words are excluded at ingest on BOTH engines, the
  // same posture as the reference's malformed-record drop.
  private val D = "\u0001"

  /** Word → initial symbol state: every character individually wrapped
    * (Java regex on the Spark side, RE2 in the oracle — both support
    * global single-char capture). */
  def initialState(word: Column): Column =
    regexp_replace(word, "(.)", D + "$1" + D)

  /** Symbol array of a state string (inverse of the wrapping). */
  def symbols(state: Column): Column =
    split(trim(state, D), D + D)

  /** Adjacent (lhs, rhs) pairs of a state's symbols. The size guard is
    * load-bearing twice over: `sequence(1, 0)` DESCENDS in Spark, and
    * ANSI `element_at` throws out of bounds — a fully-merged single-
    * symbol word must contribute an empty pair array, not an error. */
  private def adjacentPairs(state: Column): Column = {
    val s = symbols(state)
    when(size(s) >= 2,
      transform(sequence(lit(1), size(s) - 1),
        i => struct(element_at(s, i).as("lhs"), element_at(s, i + 1).as("rhs"))))
      .otherwise(array().cast("array<struct<lhs:string,rhs:string>>"))
  }

  /** The capped word-frequency table training runs on: top `vocabCap`
    * corpus words by (freq desc, word asc) — the deterministic rank cut
    * that bounds every iteration's size regardless of corpus scale. */
  def wordFreqs(docs: DataFrame, vocabCap: Int): DataFrame =
    docs
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0 && !col("word").contains(D))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(vocabCap)

  /** Train `numMerges` BPE rules over `docs`. Returns one row per rule:
    * `(step, lhs, rhs, pair_freq)` in learned order. Stops early when no
    * adjacent pair remains. */
  def train(docs: DataFrame, numMerges: Int, vocabCap: Int = 1500): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = wordFreqs(docs, vocabCap)
      .select(initialState(col("word")).as("w"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val best = vocab
        .select(col("freq"), explode(adjacentPairs(col("w"))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (lhs, rhs, f) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((step, lhs, rhs, f))
        vocab = vocab.withColumn("w",
          replace(col("w"), lit(D + lhs + D + D + rhs + D), lit(D + lhs + rhs + D)))
        // bound the chained-replace plan depth (the pageRank/CC posture)
        if (step % 8 == 0) vocab = vocab.localCheckpoint(true)
        step += 1
      }
    }
    merges.result().toDF("step", "lhs", "rhs", "pair_freq")
  }

  /** Fold a merge list into one chained-replace expression over a state
    * column — rules MUST apply in learned order (later rules reference
    * symbols earlier rules created). */
  def applyMerges(state: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(state) { case (w, (lhs, rhs)) =>
      replace(w, lit(D + lhs + D + D + rhs + D), lit(D + lhs + rhs + D))
    }

  /** Encode documents with a trained merge list: per doc, the character
    * count, the BPE token count after merging, and the compression ratio
    * — the token-budget surface a data pipeline prices corpora with.
    * The merge chain applies to DISTINCT words once (vocab-sized work)
    * and joins back to the doc word multiset; the merge list itself is
    * model-sized by construction and lives in the plan as literals. */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0 && !col("word").contains(D))
    val encoded = words.select("word").distinct()
      .select(col("word"),
        size(symbols(applyMerges(initialState(col("word")), merges)))
          .as("word_tokens"))
    words.join(encoded, "word")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum(col("word_tokens")).as("n_tokens"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_tokens"))
  }
}
