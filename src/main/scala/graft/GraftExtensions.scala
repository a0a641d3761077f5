package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VecDotProduct

/** SparkSessionExtensions entry point: registers the engine's native
  * functions so SQL users get them too (`SELECT vec_dot(a, b)`). Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession does this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_dot takes exactly 2 arguments")
        VecDotProduct(children.head, children(1))
      }))
  }
}
