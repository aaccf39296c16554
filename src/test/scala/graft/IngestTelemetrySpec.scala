package graft

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files

import scala.io.Source

import graft.operators.{IndexFiles, IndexMaintenance}
import graft.streaming.{IngestTelemetry, MetricsHttpServer, StreamingCuration}

/** The ingest daemons' ops surface: the `graft_ingest_*` self-telemetry
  * block (admission counters, batch stats, index-chain gauges, maintenance
  * outcomes) served on `/metrics` beside a `/healthz` probe — the surface
  * `graft.Ingest`/`graft.VecIngest` previously lacked (the Exporter grew
  * its in r9). Scraped over HTTP across two real batches and a
  * maintenance event, exactly as a Prometheus collector would. */
class IngestTelemetrySpec extends SparkSpec {

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code == 200) conn.getInputStream else conn.getErrorStream
    val body = Source.fromInputStream(is, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  private def metric(body: String, series: String): Option[Double] =
    ("(?m)^" + java.util.regex.Pattern.quote(series) + " (\\S+)$").r
      .findFirstMatchIn(body).map(_.group(1).toDouble)

  test("scrapes across two batches: admission counters, chain gauges, healthz flip") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ingtel").toString
    val out = s"$root/packed"
    val nearPath = s"$root/near"

    val t = new IngestTelemetry
    val gate = Ingest.nearGate(spark,
      Ingest.Config(src = "x", out = "x", checkpoint = "x",
        nearIndex = Some(nearPath)))
    t.indexProbe = () => Seq(t.probeIndexPath(spark, "near", nearPath))
    @volatile var alive = true
    val server = new MetricsHttpServer(0, "127.0.0.1")
      .attachTelemetry(t).health(() => alive).start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    try {
      val run = new StreamingCuration.CurationRun(spark, out, budget = 8L,
        nearGate = gate,
        statsPath = None, statsCompactEvery = 0, outCompactEvery = 0,
        telemetry = Some(t))
      def docsDf(lo: Long) =
        (lo until lo + 4).map(i =>
          (i, (0 until 12).map(w => s"tok${i}_$w").mkString(" "), "web", 30L))
          .toDF("doc_id", "text", "source", "n_chars")

      run.onBatch(docsDf(0), 0)
      val (c1, b1) = get(s"$base/metrics")
      assert(c1 == 200)
      assert(metric(b1, "graft_ingest_batches_total").contains(1.0), b1.take(400))
      assert(metric(b1, "graft_ingest_input_rows_total").contains(4.0))
      assert(metric(b1, "graft_ingest_admitted_rows_total").contains(4.0))
      // batch 0's admissions are STAGED (lagged fold) — the backlog gauge
      // is exactly what an operator alerts on
      assert(metric(b1, """graft_index_staged_batches{index="near"}""").contains(1.0), b1)

      // batch 1: exact copies — the gate folds batch 0 then rejects them
      run.onBatch(docsDf(0).withColumn("doc_id", $"doc_id" + 100L), 1)
      val (_, b2) = get(s"$base/metrics")
      assert(metric(b2, "graft_ingest_batches_total").contains(2.0))
      assert(metric(b2, "graft_ingest_input_rows_total").contains(8.0))
      assert(metric(b2, "graft_ingest_admitted_rows_total").contains(4.0),
        "the copies must be rejected, and the rejection must be visible")
      assert(metric(b2, "graft_ingest_rejected_rows_total").contains(4.0))
      // the fold landed a delta on the chain
      assert(metric(b2, """graft_index_delta_chain_length{index="near"}""").exists(_ >= 1.0), b2)
      assert(metric(b2, """graft_index_base_version{index="near"}""").contains(1.0))
      // the scrape counter counts itself
      assert(metric(b2, "graft_ingest_scrapes_total").contains(2.0))

      // healthz: 200 while the "query" is alive, 503 the moment it is not
      assert(get(s"$base/healthz")._1 == 200)
      alive = false
      assert(get(s"$base/healthz")._1 == 503)
    } finally {
      server.stop()
      IndexFiles.delete(spark, root)
    }
  }

  test("maintenance outcomes reach the exposition (passes, retrains, last recall)") {
    val t = new IngestTelemetry
    val decisions = scala.collection.mutable.ArrayBuffer(
      IndexMaintenance.Decision(0.9, retrained = false, None))
    t.indexProbe = () => Seq(
      t.probeIndexPath(spark, "pq", "/nonexistent-pq-path", decisions.toSeq))
    t.onBatch(5L, 5L, 0.1)
    val r1 = t.render()
    assert(r1.contains("""graft_index_maintenance_passes_total{index="pq"} 1"""), r1)
    assert(r1.contains("""graft_index_retrains_total{index="pq"} 0"""))
    assert(r1.contains("""graft_index_last_recall{index="pq"} 0.9"""))

    decisions += IndexMaintenance.Decision(0.4, retrained = true, Some(0.95))
    t.onBatch(5L, 5L, 0.1)
    val r2 = t.render()
    assert(r2.contains("""graft_index_maintenance_passes_total{index="pq"} 2"""))
    assert(r2.contains("""graft_index_retrains_total{index="pq"} 1"""))
    assert(r2.contains("""graft_index_last_recall{index="pq"} 0.95"""))

    // a never-measured family renders NaN, not a crash or a fake zero
    val t2 = new IngestTelemetry
    t2.indexProbe = () => Seq(t2.probeIndexPath(spark, "embed", "/nonexistent"))
    t2.onBatch(1L, 1L, 0.0)
    assert(t2.render().contains("""graft_index_last_recall{index="embed"} NaN"""))
  }

  test("flag parsing: --listen and --no-self-metrics on both daemons") {
    val i = Ingest.parseArgs(Seq("--src", "/i", "--out", "/o", "--checkpoint", "/c",
      "--listen", "0.0.0.0:9999", "--no-self-metrics"))
    assert(i.listen == "0.0.0.0:9999" && !i.selfMetrics)
    assert(Ingest.parseListen("127.0.0.1:8080") == ("127.0.0.1", 8080))
    val v = VecIngest.parseArgs(Seq("--src", "/i", "--out", "/o",
      "--checkpoint", "/c", "--index", "/x", "--listen", "h:1", "--no-self-metrics"))
    assert(v.listen == "h:1" && !v.selfMetrics)
    // defaults: on, at the daemon's own port (beside the exporter's 19901)
    assert(Ingest.parseArgs(Seq("--src", "/i", "--out", "/o", "--checkpoint", "/c"))
      .selfMetrics)
  }
}
