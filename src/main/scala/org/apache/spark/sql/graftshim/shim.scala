package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.DataType

/** Minimal bridge to Spark internals that are `private[sql]` in 4.x.
  * Lives in the `org.apache.spark.sql` namespace purely for access.
  *
  * In Spark 4 a `Column` wraps a `ColumnNode` tree (Connect-compatible),
  * not a Catalyst expression; comparisons surface as
  * `UnresolvedFunction(">=", …)` nodes. The lake file-pruner only needs
  * attribute/literal/function shapes, so we convert to a tiny public ADT
  * it can pattern-match without touching spark internals elsewhere.
  */
package object graftshim {

  sealed trait GNode
  case class GFn(name: String, args: Seq[GNode]) extends GNode
  case class GAttr(name: String) extends GNode
  case class GLit(value: Any, dataType: Option[DataType]) extends GNode
  case class GExpr(e: Expression) extends GNode // catalyst fallback
  case object GOpaque extends GNode

  def columnNode(c: Column): GNode = conv(c.node)

  /** Column ↔ Catalyst Expression (for custom codegen expressions). */
  def columnExpr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def columnOf(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  private def conv(n: internal.ColumnNode): GNode = n match {
    case f: internal.UnresolvedFunction =>
      GFn(f.functionName.toLowerCase(java.util.Locale.ROOT),
        f.arguments.map(conv))
    case a: internal.UnresolvedAttribute => GAttr(a.nameParts.mkString("."))
    case l: internal.Literal => GLit(l.value, l.dataType)
    case e: classic.ExpressionColumnNode => GExpr(e.expression)
    case _ => GOpaque
  }
}
