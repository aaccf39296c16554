package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd inner loops for the sketch-dedup operators. Both compute
  * EXACTLY the arithmetic their DuckDB oracles replay (md5-derived integer
  * hashes, affine permutations) — they exist to keep the hot per-row work
  * inside whole-stage codegen instead of interpreted higher-order
  * functions, and, for simhash, to make the signature pure map-side work
  * (no token explode, no 60-counter aggregation shuffle).
  */
object SketchHashes {

  /** 60-bit token hash: the first 15 hex chars of md5(token) as an integer
    * — `conv(substring(md5(w), 1, 15), 16, 10)` computed directly from the
    * digest bytes (7 full bytes then the high nibble of byte 7). */
  private def md5Bits60(md: java.security.MessageDigest, token: String): Long = {
    md.reset()
    val d = md.digest(token.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** SimHash signature of a space-tokenized text: per-bit majority vote of
    * the 60-bit md5-derived token hashes, one pass over the tokens. Same
    * value as `sum ± 1 per bit, bit set iff sum > 0` over
    * `explode(split(text, ' '))` — without the explode or the shuffle. */
  def simhashSig(text: UTF8String, bits: Int): Long = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < toks.length) {
      val h = md5Bits60(md, toks(t))
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** `(a * s) mod (2^61 - 1)` with FULL 128-bit intermediate — the
    * multipliers are 61-bit, so `a * s` overflows a Long and a bare `%`
    * would silently compute garbage. Mersenne reduction: with
    * x = hi·2^64 + lo and 2^61 ≡ 1 (mod p), x ≡ hi·8 + (lo >>> 61) +
    * (lo & p); hi < 2^58 for 61-bit operands so hi·8 never overflows. */
  def mulModM61(a: Long, s: Long): Long = {
    val p = 2305843009213693951L // 2^61 - 1
    val hi = Math.multiplyHigh(a, s)
    val lo = a * s // low 64 bits (operands nonneg, hi carries the rest)
    var r = (hi << 3) + (lo >>> 61) + (lo & p)
    while (r >= p) r -= p
    r
  }

  /** All `k` affine minhashes `min_s (a_j * s + b_j) mod p` of a NON-EMPTY
    * bigint array in one traversal (each element read once, all seeds
    * updated in registers) — replacing k interpreted
    * `array_min(transform(...))` lambda passes.
    *
    * `p` must be 2^61 − 1 (the multiply runs through [[mulModM61]]); the
    * multipliers are full 61-bit values — the r10 gate leak exposed that
    * small multipliers make the "permutation" ORDER-PRESERVING (`a·s + b`
    * never wraps when `a·s < p`, so every seed's argmin is the global
    * minimum shingle and all 32 minhashes collapse to one order
    * statistic; a near-dup differing in its minimum shingle then shares
    * ZERO bands at any similarity). */
  def affineMinHashes(shs: ArrayData, as: Array[Long], bs: Array[Long],
      p: Long): ArrayData = {
    val n = shs.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shs.getLong(i)
      var j = 0
      while (j < k) {
        var h = mulModM61(as(j), s) + bs(j) // both < p; sum < 2p
        if (h >= p) h -= p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /** Sorted distinct 48-bit hashes of a text's 3-word shingles — the first
    * 12 hex chars of md5(shingle) as an integer (6 digest bytes), matching
    * `conv(substring(md5(s), 1, 12), 16, 10)`; texts under 3 tokens hash
    * whole. One pass: build each shingle string, hash, sort, dedup —
    * replacing an interpreted CASE + transform + array_sort + array_distinct
    * lambda chain. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(s: String): Long = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 6) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h
    }
    if (toks.length < n) return new GenericArrayData(Array[Any](h48(text.toString)))
    val m = toks.length - n + 1
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      hs(i) = h48(sb.toString)
      i += 1
    }
    java.util.Arrays.sort(hs)
    val out = new Array[Any](m)
    var k = 0
    i = 0
    while (i < m) {
      if (k == 0 || hs(i) != hs(i - 1)) { out(k) = hs(i); k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }

  def simhash_sig(c: Column, bits: Int): Column =
    GraftColumns.of(SimHashSigExpr(GraftColumns.expr(c), bits))

  def shingle_hashes(c: Column, n: Int): Column =
    GraftColumns.of(ShingleHashesExpr(GraftColumns.expr(c), n))

  def affine_min_hashes(c: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    GraftColumns.of(AffineMinHashesExpr(GraftColumns.expr(c), as, bs, p))
}

case class SimHashSigExpr(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SketchHashes.simhashSig(input.asInstanceOf[UTF8String], bits)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHashes.simhashSig($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSigExpr =
    copy(child = newChild)
}

case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    SketchHashes.shingleHashes(input.asInstanceOf[UTF8String], n)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHashes.shingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class AffineMinHashesExpr(child: Expression, as: Seq[Long], bs: Seq[Long],
    p: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "affine_min_hashes"

  @transient private lazy val asArr: Array[Long] = as.toArray
  @transient private lazy val bsArr: Array[Long] = bs.toArray

  override def nullSafeEval(input: Any): Any =
    SketchHashes.affineMinHashes(input.asInstanceOf[ArrayData], asArr, bsArr, p)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHashes.affineMinHashes($c, $asRef, $bsRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): AffineMinHashesExpr =
    copy(child = newChild)
}
