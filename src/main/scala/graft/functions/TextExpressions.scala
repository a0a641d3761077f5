package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

object TextExpressions {
  def wordShingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), k))
}
