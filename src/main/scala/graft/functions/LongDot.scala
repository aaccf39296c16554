package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** `long_dot(a, b)`: exact integer dot product of two BIGINT arrays — the
  * hot inner operation of the similarity operators (quantized embeddings,
  * LSH hyperplane projections). Semantically equal to
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)` but as
  * ONE codegen'd expression: the higher-order-function composition
  * interprets two lambdas per element and allocates an intermediate array
  * per row, which dominates the pairwise similarity scans.
  *
  * Extra elements of the longer array are ignored (the engine's embedding
  * arrays are fixed-length, so lengths always match in practice).
  */
object LongDot {

  /** Codegen/eval entry point. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  def long_dot(a: Column, b: Column): Column =
    GraftColumns.of(LongDotExpr(GraftColumns.expr(a), GraftColumns.expr(b)))
}

case class LongDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    LongDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    nullSafeEval(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LongDot.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotExpr =
    copy(left = newLeft, right = newRight)
}
