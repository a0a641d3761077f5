package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is `private[sql]`, so this
  * one-liner lives under the `org.apache.spark.sql` namespace — the standard
  * pattern for libraries that ship custom Catalyst expressions (same access
  * trick Spark connectors use). No Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. [[expression]] wraps the column
    * node lazily (`ColumnNodeExpression`), which Dataset API paths resolve
    * but the analyzer does NOT descend into when the tree is returned from
    * an injected SQL function builder (Unevaluable at codegen). This
    * converts the node tree to plain catalyst expressions up front. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
