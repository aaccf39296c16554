package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RollingHashes

/** The rolling recurrence must equal the naive per-window left fold
  * `(acc * Base + byte) mod Mod` — the exact identity the winnowing/span
  * DuckDB oracles rely on (they compute the fold in 128-bit HUGEINT; the
  * expression rolls with multiplyHigh). The reference fold here uses BigInt
  * so it is trivially overflow-free at the 61-bit modulus. */
class RollingHashesSpec extends AnyFunSuite {

  private def naive(s: String, k: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    (0 to bytes.length - k).map { i =>
      bytes.slice(i, i + k).foldLeft(BigInt(0))((acc, b) =>
        (acc * RollingHashes.Base + (b & 0xff)) % RollingHashes.Mod).toLong
    }
  }

  private def rolled(s: String, k: Int): Seq[Long] = {
    val arr = RollingHashes.hashes(UTF8String.fromString(s), k)
    (0 until arr.numElements()).map(arr.getLong)
  }

  test("rolling equals the naive fold on random ASCII strings, all values in [0, Mod)") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic property sweep
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(201)
      val s = Seq.fill(n)((32 + rnd.nextInt(95)).toChar).mkString
      val k = 1 + rnd.nextInt(20)
      val r = rolled(s, k)
      assert(r == naive(s, k), s"mismatch at k=$k, s=${s.take(40)}...")
      assert(r.forall(h => h >= 0 && h < RollingHashes.Mod))
    }
  }

  test("rolling equals the naive fold on multibyte UTF-8 (hash consumes bytes, not chars)") {
    val s = "héllo wörld — naïve café über 日本語テキスト mixed ascii tail"
    for (k <- Seq(1, 3, 8, 16, 24)) assert(rolled(s, k) == naive(s, k))
    // window count is byte-based: n_bytes - k + 1, not n_chars - k + 1
    assert(rolled(s, 24).length == s.getBytes("UTF-8").length - 24 + 1)
  }

  test("edge cases: shorter than k is empty; k equals length is one hash; null is null") {
    assert(rolled("abc", 4).isEmpty)
    assert(rolled("abc", 3) == naive("abc", 3) && rolled("abc", 3).length == 1)
    assert(RollingHashes.hashes(null, 3) == null)
  }

  test("a shared window hashes identically regardless of surrounding text") {
    val core = "the shared sixteen"
    val a = "prefix one " + core + " suffix alpha"
    val b = "completely different lead " + core + " other tail"
    val (ha, hb) = (rolled(a, 16).toSet, rolled(b, 16).toSet)
    // every 16-byte window fully inside `core` appears in both
    val coreHashes = rolled(core, 16).toSet
    assert(coreHashes.subsetOf(ha) && coreHashes.subsetOf(hb))
  }
}
