package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI contract of the curation-ingest daemon (the end-to-end pipeline
  * itself is proven in StreamingCurationSpec; this pins the flag surface
  * the way ExporterSpec pins the exporter's). */
class IngestSpec extends AnyFunSuite {

  test("flag parsing: required args, rates, once") {
    val c = Ingest.parseArgs(Seq(
      "--src", "/in", "--out", "/out", "--checkpoint", "/ck",
      "--budget", "1024", "--rate", "0.4",
      "--rate-for", "web=0.25", "--rate-for", "wiki=1.0",
      "--bm25-compact-every", "7", "--out-compact-every", "9", "--once"))
    assert(c.src == "/in" && c.out == "/out" && c.checkpoint == "/ck")
    assert(c.budget == 1024L && c.defaultRate == 0.4 && c.once)
    assert(c.bm25CompactEvery == 7 && c.outCompactEvery == 9)
    assert(c.rates("web") == 0.25 && c.rates("wiki") == 1.0)
    // base rates remain for sources not overridden
    graft.operators.Sampling.DefaultRates.keys.foreach { k =>
      assert(c.rates.contains(k))
    }
  }

  test("missing required flags and malformed rate-for fail loudly") {
    intercept[IllegalArgumentException] { Ingest.parseArgs(Seq("--src", "/in")) }
    intercept[IllegalArgumentException] { Ingest.parseArgs(Seq("--bogus")) }
    intercept[IllegalArgumentException] {
      Ingest.parseArgs(Seq("--src", "/in", "--out", "/o", "--checkpoint", "/c",
        "--rate-for", "webrate"))
    }
  }
}
