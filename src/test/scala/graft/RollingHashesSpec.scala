package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RollingHashes

/** The rolling recurrence must equal the naive per-window left fold
  * `(acc * Base + byte) mod Mod` — the exact identity the winnowing DuckDB
  * oracle relies on (it computes the fold; the expression rolls). */
class RollingHashesSpec extends AnyFunSuite {

  private def naive(s: String, k: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    (0 to bytes.length - k).map { i =>
      bytes.slice(i, i + k).foldLeft(0L)((acc, b) =>
        (acc * RollingHashes.Base + (b & 0xff)) % RollingHashes.Mod)
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
