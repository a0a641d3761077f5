package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeOps

/** BPE training/encoding semantics on hand corpora: merge order under the
  * frequency + tie-break rule, greedy leftmost overlap handling, rule
  * chaining into multi-char symbols, and encode counts. */
class BpeOpsSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("merge order follows pair frequency with (lhs, rhs) tie-break") {
    // "abab" x3, "abc" x2: pair counts step 1: (a,b)=8, (b,a)=3, (b,c)=2
    val docs = corpus((1L, "abab abab abab abc abc"))
    val m = BpeOps.train(docs, numMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "b", 8L)))
    // after (a,b)->ab: "abab" = [ab, ab] x3 -> (ab,ab)=3; "abc" = [ab, c] x2 -> (ab,c)=2
    assert(m(1) == ((2, "ab", "ab", 3L)))
    assert(m(2) == ((3, "ab", "c", 2L)))
  }

  test("overlapping runs merge leftmost-greedy; training stops when exhausted") {
    // "aaa": pairs (a,a)=2 -> merge (a,a); applying leaves [aa, a] ->
    // next pair (aa, a)=1; then [aaa] exhausts
    val docs = corpus((1L, "aaa"))
    val m = BpeOps.train(docs, numMerges = 10).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(m.toSeq == Seq(("a", "a"), ("aa", "a")))
  }

  test("encode: token counts shrink by learned rules, chars preserved") {
    val docs = corpus((1L, "abab abc"), (2L, "zz"))
    val merges = BpeOps.train(docs, numMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = BpeOps.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: merges learned on this corpus: (a,b) then (ab,ab) ->
    // "abab" = 1 token, "abc" = [ab, c] = 2 tokens
    assert(enc(1L) == ((2L, 7L, 3L))) // 2 words, 7 chars, 3 tokens
    // doc 2: no rule touches z -> 1 word, 2 chars, 2 tokens
    assert(enc(2L) == ((1L, 2L, 2L)))
  }

  test("encode survives a production-depth merge chain (256 nested replaces)") {
    val s = spark
    import s.implicits._
    // a corpus whose bigram-compound derivation funds 256 real merges
    // (the bpe_train_large shape), then encode the RAW corpus through
    // the full 256-rule chain — exercises the 256-deep nested-replace
    // expression (codegen or interpreted fallback, either must work)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    // compound-bigram corpus (raw vocab exhausts at ~89 rules)
    val tks = org.apache.spark.sql.functions.filter(
      graft.operators.TextOps.tokens(col("text")), t => length(t) > lit(0))
    val compounds = when(size(tks) >= 2,
      transform(sequence(lit(1), size(tks) - 1),
        i => concat(element_at(tks, i), lit("_"), element_at(tks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val merges = BpeOps.train(
        docs.select(array_join(compounds, " ").as("text")),
        numMerges = 256, vocabCap = 800).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length == 256, s"only ${merges.length} rules learned")
    val enc = BpeOps.encode(docs, merges).collect()
    assert(enc.nonEmpty)
    // invariants: tokens never exceed chars, never fall below words
    enc.foreach { r =>
      val (w, c, t) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t <= c && t >= w, s"doc ${r.getLong(0)}: words=$w chars=$c tokens=$t")
    }
  }
}
