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
  * p = 2^61 - 1 (prime — the same modulus discipline as the minhash family,
  * [[graft.operators.Dedup]]'s `MinHashP`).
  *
  * WHY 61 bits: the span-dedup consumers treat "hash count > 1" as "window
  * content duplicated", so hash collisions are phantom duplicates. With W
  * windows corpus-wide the expected number of colliding window PAIRS is
  * ≈ W²/2^62: at sf0.1 (W ≈ 10^7) that is ~10^-5 expected phantom pairs,
  * and even at a 100 TB corpus (W ≈ 10^14) the per-window false-dup rate
  * stays ≈ W/2^61 ≈ 4×10^-5 — whereas a 31-bit space saturates completely
  * (every window "duplicated") somewhere around W ≈ 10^9, i.e. low-GB
  * corpus sizes.
  *
  * Cross-engine exactness: a step `acc·257 + byte` no longer fits in 64
  * bits, so the JVM side reduces the 128-bit product with
  * `Math.multiplyHigh` and the Mersenne identity 2^64 ≡ 8 (mod 2^61−1),
  * while a SQL oracle replays the identical left fold
  * `(acc * 257 + byte) mod p` in 128-bit integer arithmetic (DuckDB
  * HUGEINT) — both are exact mod-p, so window hashes agree bit-for-bit
  * and the winnowing/span pipelines stay SQL-oracle-checked.
  *
  * Building block for MOSS-style winnowing fingerprints
  * ([[graft.operators.TextAnalysis.winnowingFingerprints]]) and
  * substring-span dedup ([[graft.operators.Dedup.spans]]).
  */
object RollingHashes {
  final val Base = 257L
  final val Mod = 2305843009213693951L // 2^61 - 1, prime (Mersenne)

  /** `a·b mod (2^61−1)` for 0 ≤ a, b < 2^61−1, exact: split the 128-bit
    * product into `hi·2^64 + lo`, then fold with 2^61 ≡ 1 (so
    * 2^64 ≡ 2^3): product ≡ (hi·8 + lo₆₃..₆₁) + lo₆₀..₀. Each term is
    * < 2^61, the sum < 2^63 — two conditional subtractions normalize. */
  @inline private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
    if (r >= Mod) r -= Mod
    if (r >= Mod) r -= Mod
    r
  }

  /** Codegen/eval entry point. Returns n-k+1 hashes (empty if n < k). */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    if (s == null || k <= 0) return null
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // B^(k-1) mod p
    var pow = 1L
    var i = 1
    while (i < k) { pow = mulMod(pow, Base); i += 1 }
    val out = new Array[Any](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) {
      h = mulMod(h, Base) + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
      i += 1
    }
    out(0) = h
    i = k
    while (i < n) {
      // drop the outgoing byte (re-centered into [0, p)), shift, add incoming
      var t = h - mulMod(bytes(i - k) & 0xff, pow)
      if (t < 0) t += Mod
      h = mulMod(t, Base) + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
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
