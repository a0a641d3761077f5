package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-gram shingles of a token array in one loop.
  *
  * Output strings are byte-identical to the composed form
  * (`concat_ws(" ", t_i, t_i+1, t_i+2)`, one partial all-tokens shingle for
  * docs shorter than k), so fingerprint oracles (md5 over shingles) are
  * unaffected. The composed form needed nested higher-order functions —
  * interpreted, with a lambda frame per element; this is a plain
  * JIT-compiled loop (same rationale as [[HashExpressions]]).
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires array<string>, got ${other.simpleString}")
    }

  private val space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // Null tokens are passed to concatWs as Java nulls, which it skips (no
    // separator emitted) — exactly concat_ws semantics, so parity holds even
    // for token arrays containing nulls.
    def tok(i: Int): UTF8String =
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    if (n >= k) {
      val out = new Array[AnyRef](n - k + 1)
      var i = 0
      while (i <= n - k) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = tok(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = tok(i); i += 1 }
      new GenericArrayData(Array[AnyRef](UTF8String.concatWs(space, parts: _*)))
    }
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Per-document n-gram repetition statistics in one loop — the
  * repeated-content quality signals used by published web-corpus filters
  * (fraction of characters in the most frequent word n-gram; fraction of
  * characters covered by duplicated n-grams).
  *
  * Returns `struct(top_gram, top_freq, top_chars, dup_chars, n_grams)`:
  *   - `top_gram`: the most frequent n-gram (ties → lexicographically
  *     smallest, so the pick is deterministic and oracle-replicable);
  *     `""` when the doc has fewer than `k` tokens (no full n-gram).
  *   - `top_chars` = top_freq × numChars(top_gram);
  *   - `dup_chars` = Σ over grams with freq ≥ 2 of freq × numChars(gram);
  *   - `n_grams`  = number of n-gram windows (0 for short docs).
  * Character counts are Unicode code points (Spark `numChars` ≡ DuckDB
  * `length`). Fractions are left to the caller (single IEEE division of
  * these exact integers stays bit-deterministic).
  *
  * This is per-row local work — a map-only stage at any scale. The
  * composed alternative (explode n-grams → two aggregations → join back)
  * would shuffle every n-gram of every document.
  */
case class NgramRepetition(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = NgramRepetition.schema
  override def prettyName: String = "ngram_repetition"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_repetition requires array<string>, got ${other.simpleString}")
    }

  private val space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val nGrams = math.max(0, n - k + 1)
    if (nGrams == 0)
      return new GenericInternalRow(Array[Any](UTF8String.EMPTY_UTF8, 0, 0L, 0L, 0))
    val freq = new java.util.HashMap[UTF8String, Integer](nGrams * 2)
    def tok(i: Int): UTF8String =
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    var i = 0
    while (i < nGrams) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = tok(i + j); j += 1 }
      freq.merge(UTF8String.concatWs(space, parts: _*), 1, (a, b) => a + b)
      i += 1
    }
    var topGram: UTF8String = null
    var topFreq = 0
    var dupChars = 0L
    val it = freq.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val f = e.getValue.intValue()
      if (f > topFreq || (f == topFreq && e.getKey.compareTo(topGram) < 0)) {
        topFreq = f; topGram = e.getKey
      }
      if (f >= 2) dupChars += f.toLong * e.getKey.numChars()
    }
    new GenericInternalRow(Array[Any](
      topGram, topFreq, topFreq.toLong * topGram.numChars(), dupChars, nGrams))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramRep", this, classOf[NgramRepetition].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
    copy(child = newChild)
}

object NgramRepetition {
  val schema: StructType = StructType(Seq(
    StructField("top_gram", StringType, nullable = false),
    StructField("top_freq", IntegerType, nullable = false),
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false)))
}

object TextExpressions {
  def wordShingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), k))

  def ngramRepetition(tokens: Column, k: Int): Column =
    ColumnBridge.column(NgramRepetition(ColumnBridge.expression(tokens), k))
}
