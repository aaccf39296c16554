package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hashes(text, k)`: Rabin-Karp polynomial hashes of every k-byte
  * window of the UTF-8 text, computed in one O(n) pass (each step is one
  * multiply-add and one subtract — the defining property of a rolling hash,
  * vs O(n·k) for independent window hashes). Base 257, arithmetic mod
  * p = 2^31 - 1 (prime): every intermediate stays below 2^40, so the same
  * polynomial is exact overflow-free BIGINT math in ANY engine — which is
  * what lets the winnowing pipeline be SQL-oracle-checked (the oracle
  * recomputes each window hash as a left fold `(acc * 257 + byte) mod p`;
  * the rolling recurrence here produces identical values in O(n)).
  *
  * Building block for MOSS-style winnowing fingerprints
  * ([[graft.operators.TextAnalysis.winnowingFingerprints]]).
  */
object RollingHashes {
  final val Base = 257L
  final val Mod = 2147483647L // 2^31 - 1, prime

  /** Codegen/eval entry point. Returns n-k+1 hashes (empty if n < k). */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    if (s == null || k <= 0) return null
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // B^(k-1) mod p
    var pow = 1L
    var i = 1
    while (i < k) { pow = pow * Base % Mod; i += 1 }
    val out = new Array[Any](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      // drop the outgoing byte (re-centered into [0, p)), shift, add incoming
      h = ((h - (bytes(i - k) & 0xff) * pow % Mod + Mod) % Mod * Base + (bytes(i) & 0xff)) % Mod
      out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def rolling_hashes(c: Column, k: Int): Column =
    GraftColumns.of(RollingHashesExpr(GraftColumns.expr(c), k))
}

case class RollingHashesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(input: Any): Any =
    RollingHashes.hashes(input.asInstanceOf[UTF8String], k)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.RollingHashes.hashes(${c.value}, $k);
        ${ev.isNull} = ${ev.value} == null;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashesExpr =
    copy(child = newChild)
}
