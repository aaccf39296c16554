package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `sorted_intersect_count(a, b)`: size of the intersection of two SORTED,
  * DISTINCT string arrays via a two-pointer merge scan — O(|a|+|b|) with no
  * per-row hash-set allocation, unlike `array_intersect`. This is the hot
  * inner operation of the pairwise dedup operators (n² pairs inside a
  * block), where the per-pair constant dominates the whole job.
  *
  * Inputs MUST be sorted ascending and duplicate-free
  * (`array_sort(array_distinct(...))` — done once per row, not per pair);
  * behavior on unsorted input is unspecified.
  */
object SortedIntersectCount {

  /** Codegen/eval entry point (string arrays). */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val cmp = if (x == null) -1 else if (y == null) 1 else x.compareTo(y)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Codegen/eval entry point (bigint arrays — hashed-token sets). */
  def countLongs(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftColumns.of(SortedIntersectCountExpr(GraftColumns.expr(a), GraftColumns.expr(b)))
}

case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_intersect_count"

  /** Element-type dispatch: bigint arrays take the primitive merge scan. */
  private lazy val longElems: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (longElems)
      SortedIntersectCount.countLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    nullSafeEval(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (longElems) "countLongs" else "count"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.$m($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}
