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

  /** The capped word-frequency table training runs on: top `vocabCap`
    * corpus words by (freq desc, word asc) — the deterministic rank cut
    * that bounds every iteration's size regardless of corpus scale. */
  def wordFreqs(docs: DataFrame, vocabCap: Int): DataFrame =
    wordFreqsOf(
      docs.select(explode(TextOps.tokens(col("text"))).as("word")), vocabCap)

  /** [[wordFreqs]] over an ALREADY-TOKENIZED corpus (one `word` column) —
    * a caller holding token arrays feeds them directly instead of
    * re-joining into text for [[wordFreqs]] to re-split (that round trip
    * costs a full regex pass over every document; whitespace-free tokens
    * make the two exactly equivalent). */
  def wordFreqsOf(words: DataFrame, vocabCap: Int): DataFrame =
    words
      .where(length(col("word")) > 0 && !col("word").contains(D))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(vocabCap)

  /** UTF-8-byte string order — Spark's `orderBy` on strings compares
    * UTF8String bytes unsigned (as does DuckDB's binary collation), and
    * the driver-local argmax must break ties IDENTICALLY. Java's
    * `String.compareTo` is UTF-16-code-unit order, which disagrees for
    * supplementary characters — not a theoretical risk on a real corpus. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** A word's code points as one-symbol strings — the driver-side twin of
    * [[initialState]] (Java regex `(.)` and RE2 `(.)` both match per code
    * point, so the symbol unit is the code point, not the UTF-16 char). */
  private def codePointSymbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Train `numMerges` BPE rules over `docs`. Returns one row per rule:
    * `(step, lhs, rhs, pair_freq)` in learned order. Stops early when no
    * adjacent pair remains.
    *
    * The corpus is touched by exactly ONE Spark job — the capped
    * word-frequency pass — regardless of `numMerges`. The frequency
    * table is model-sized by construction (`vocabCap` rows), so the
    * merge loop runs driver-local over it: pair counting, the (freq
    * desc, lhs asc, rhs asc) argmax, and the leftmost-nonoverlapping
    * merge are bit-identical to the previous one-Spark-job-per-merge
    * formulation (the export oracle replays every step and would redden
    * on any divergence), but a 32k-merge production vocab now costs 32k
    * in-memory iterations instead of 32k sequential distributed jobs. */
  def train(docs: DataFrame, numMerges: Int, vocabCap: Int = 1500): DataFrame =
    trainOnFreqs(docs.sparkSession,
      wordFreqs(docs, vocabCap).collect(), numMerges)

  /** [[train]] over an already-tokenized corpus — see [[wordFreqsOf]]. */
  def trainFromWords(words: DataFrame, numMerges: Int,
                     vocabCap: Int = 1500): DataFrame =
    trainOnFreqs(words.sparkSession,
      wordFreqsOf(words, vocabCap).collect(), numMerges)

  private def trainOnFreqs(spark: org.apache.spark.sql.SparkSession,
                           wf: Array[org.apache.spark.sql.Row],
                           numMerges: Int): DataFrame = {
    import spark.implicits._
    val states: Array[Array[String]] =
      wf.map(r => codePointSymbols(r.getString(0)))
    val freqs: Array[Long] = wf.map(_.getLong(1))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      // ALL adjacent pairs, overlapping occurrences included — the same
      // multiset the explode→sum produced ([a,a,a] counts (a,a) twice)
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < states.length) {
        val s = states(wi); val f = freqs(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestK: (String, String) = null
        var bestF = Long.MinValue
        counts.foreach { case (k, f) =>
          if (bestK == null || f > bestF || (f == bestF &&
              (utf8Less(k._1, bestK._1) || (k._1 == bestK._1 &&
                utf8Less(k._2, bestK._2))))) {
            bestK = k; bestF = f
          }
        }
        val (lhs, rhs) = bestK
        merges += ((step, lhs, rhs, bestF))
        // leftmost-nonoverlapping greedy — what literal replace does on
        // the delimited string (replacements are never rescanned)
        wi = 0
        while (wi < states.length) {
          val s = states(wi)
          var hit = false
          var i = 0
          while (!hit && i < s.length - 1) {
            hit = s(i) == lhs && s(i + 1) == rhs; i += 1
          }
          if (hit) {
            val out = Array.newBuilder[String]
            i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == lhs && s(i + 1) == rhs) {
                out += lhs + rhs; i += 2
              } else { out += s(i); i += 1 }
            }
            states(wi) = out.result()
          }
          wi += 1
        }
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
