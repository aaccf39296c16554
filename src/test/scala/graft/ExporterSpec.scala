package graft

import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, StandardOpenOption}

import scala.io.Source

/** End-to-end drive of the reference-binary equivalent: tail a live file,
  * scrape GET /metrics, watch counters move, shut down gracefully. */
class ExporterSpec extends SparkSpec {

  private def get(url: String): String = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    conn.disconnect()
    body
  }

  test("flag parsing mirrors the reference CLI (main.go:17-21)") {
    val c = Exporter.parseArgs(Seq("--log", "/tmp/x.log", "--listen",
      "127.0.0.1:9999", "--from-start"))
    assert(c.log == "/tmp/x.log" && c.listen == "127.0.0.1:9999" && c.fromStart)
    val d = Exporter.parseArgs(Nil)
    assert(d.log == "/var/log/clickhouse-server/clickhouse-server.log")
    assert(d.listen == "0.0.0.0:19901" && !d.fromStart)
    intercept[IllegalArgumentException] { Exporter.parseArgs(Seq("--bogus")) }
  }

  test("missing log file fails pre-flight before anything starts") {
    intercept[IllegalArgumentException] {
      Exporter.run(spark, Exporter.Config(log = "/does/not/exist.log"))
    }
  }

  test("exporter end-to-end: tail, merge, scrape, shutdown") {
    val f = Files.createTempFile("graft-exporter", ".log")
    val dt = "2024.03.01 12:00:01.000000"
    val (server, query) = Exporter.run(spark,
      Exporter.Config(log = f.toString, listen = "127.0.0.1:0", fromStart = true))
    try {
      def append(s: String): Unit =
        Files.write(f, (s + "\n").getBytes, StandardOpenOption.APPEND)
      def poll(pred: String => Boolean): String = {
        val deadline = System.nanoTime() + 90000L * 1000000L
        var body = get(s"http://127.0.0.1:${server.boundPort}/metrics")
        while (!pred(body) && System.nanoTime() < deadline) {
          query.processAllAvailable()
          body = get(s"http://127.0.0.1:${server.boundPort}/metrics")
        }
        body
      }

      append(s"$dt [ 7 ] {e1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1")
      val b1 = poll(_.contains("""clickhouse_query_count{stmt_type="select"} 1"""))
      assert(b1.contains("""clickhouse_query_count{stmt_type="select"} 1"""))

      append(s"$dt [ 7 ] {e1} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec.")
      append(s"2024.03.01 12:00:03.500000 [ 7 ] {e1} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB.")
      val b2 = poll(_.contains("clickhouse_select_query_rows_read_count 1"))
      assert(b2.contains("""clickhouse_query_time_bucket{stmt_type="select",le="5"} 1"""))
      assert(b2.contains("clickhouse_query_time_count{stmt_type=\"select\"} 1"))
      assert(b2.contains("clickhouse_select_query_rows_read_sum 500"))

      // orphan stats for an unknown id -> not_found counter
      append(s"$dt [ 7 ] {ghost} <Information> executeQuery: Read 1 rows, 1 KiB in 0.100 sec., 10 rows/sec., 1 KiB/sec.")
      val b3 = poll(_.contains("""chlogexporter_errors{type="not_found_query"} 1"""))
      assert(b3.contains("""chlogexporter_errors{type="not_found_query"} 1"""))
    } finally {
      query.stop()
      server.stop(0)
    }
    intercept[Exception] { get(s"http://127.0.0.1:${server.boundPort}/metrics") }
  }
}
