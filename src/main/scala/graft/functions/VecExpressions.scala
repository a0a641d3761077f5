package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<double>` / `array<float>` columns.
  *
  * This is the custom-Expression rung of the extension ladder (compose
  * built-ins < custom Expression < custom plan): the higher-order-function
  * formulation (`aggregate(zip_with(...))`) allocates a lambda frame per
  * element and is excluded from whole-stage codegen; this expression
  * generates a tight primitive loop inside the surrounding codegen stage.
  * Accumulation order is left-to-right, bit-identical to the HOF version
  * and to the DuckDB oracle's `list_dot_product` on double lists.
  *
  * Float arrays are read directly with an exact per-element float→double
  * widening — the same result as `transform(v, cast)` first, WITHOUT the
  * HOF: a `transform` in the plan both falls out of whole-stage codegen and
  * gets inlined by projection collapse into every downstream reference
  * (re-materializing a boxed array per reference per row — measured 10×+ on
  * the LSH bucket assignment, which references the vector 64 times).
  *
  * Null handling: a null array yields null; null *elements* are treated as
  * 0 contribution (embedding vectors are dense and non-null by contract).
  */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double|float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = isFloat(left)
    val bf = isFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
      }
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(v: String, e: Expression) =
        if (isFloat(e)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotProduct =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Column API for [[VecDotProduct]] (array<double> or array<float>). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
