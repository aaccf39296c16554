package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ByteFmt

/** cloudfoundry bytefmt.ToBytes semantics (reference query.go:150-162). */
class ByteFmtSpec extends AnyFunSuite {

  private def p(s: String): java.lang.Long = ByteFmt.parse(s)

  test("basic units are 1024-based, B/KB/KiB equivalences") {
    assert(p("5B") == 5L)
    assert(p("1K") == 1024L)
    assert(p("1KB") == 1024L)
    assert(p("1KiB") == 1024L)
    assert(p("1kib") == 1024L) // case-insensitive
    assert(p("10M") == 10L * 1024 * 1024)
    assert(p("1G") == 1024L * 1024 * 1024)
    assert(p("2TB") == 2L * 1024 * 1024 * 1024 * 1024)
    assert(p("1P") == 1024L * 1024 * 1024 * 1024 * 1024)
    assert(p("1E") == 1024L * 1024 * 1024 * 1024 * 1024 * 1024)
  }

  test("fractional mantissa truncates toward zero (Go uint64 cast)") {
    assert(p("1.23GiB") == (1.23 * 1024 * 1024 * 1024).toLong)
    assert(p("1.23 GiB") == (1.23 * 1024 * 1024 * 1024).toLong) // inner space stripped
    assert(p("2.70 GiB") == (2.70 * 1024 * 1024 * 1024).toLong)
    assert(p("0.5K") == 512L)
  }

  test("invalid inputs are null (convert-error path)") {
    assert(p("abc") == null)
    assert(p("") == null)
    assert(p("-5M") == null) // bytefmt rejects negatives
    assert(p("5X") == null)
    assert(p("5") == null) // unit required
    assert(p(null) == null)
  }

  test("bytefmt grammar edges: ParseFloat mantissas, exact unit switch") {
    // ParseFloat accepts these prefixes -> valid
    assert(p("+5K") == 5L * 1024)
    assert(p(".5K") == 512L)
    assert(p("5.K") == 5L * 1024)
    // bytefmt's switch has no bare "KI"/"MI" cases -> invalid
    assert(p("1Ki") == null)
    assert(p("1Mi") == null)
    // scientific notation can't reach ParseFloat ('e'/'E' is split as unit)
    assert(p("1e3K") == null)
    // sign inside ParseFloat but negative value still rejected
    assert(p("-0.5K") == null)
  }

  test("property: integral mantissas round-trip exactly") {
    val units = Seq("B" -> 1L, "K" -> 1024L, "M" -> 1024L * 1024,
      "G" -> 1024L * 1024 * 1024, "T" -> 1024L * 1024 * 1024 * 1024)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500; (u, mult) <- units) {
      val n = rnd.nextLong(1000000L)
      assert(p(s"$n$u") == n * mult, s"$n$u")
    }
  }
}
