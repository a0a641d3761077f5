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
}
