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
    // fleet: repeated --log flags and comma-separated both accumulate
    val f1 = Exporter.parseArgs(Seq("--log", "/a.log", "--log", "/b.log"))
    assert(f1.logs == Seq("/a.log", "/b.log"))
    val f2 = Exporter.parseArgs(Seq("--log", "/a.log,/b.log,/c.log"))
    assert(f2.logs == Seq("/a.log", "/b.log", "/c.log"))
  }

  test("--backfill: archives feed the merge before the live tail; fleet+backfill rejected") {
    val arch = Files.createTempFile("graft-exporter-bf-arch", ".log")
    val live = Files.createTempFile("graft-exporter-bf-live", ".log")
    val dt = "2024.03.01 12:00:01.000000"
    Files.write(arch, (
      s"$dt [ 7 ] {b1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1\n" +
      s"$dt [ 7 ] {b1} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB.\n" +
      s"$dt [ 7 ] {b2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2\n").getBytes)
    Files.write(live,
      s"$dt [ 7 ] {b3} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 3\n".getBytes)

    assert(Exporter.parseArgs(Seq("--backfill", s"$arch")).backfill == Seq(arch.toString))
    // the bare form is the single-file shorthand; a fleet must NAME the member
    intercept[IllegalArgumentException] {
      Exporter.run(spark, Exporter.Config(
        logs = Seq(live.toString, arch.toString), backfill = Seq(arch.toString)))
    }
    // the live= form parses and merges across repeated flags
    val bf = Exporter.parseArgs(Seq(
      "--backfill", "live.log=a.1,a.2", "--backfill", "live.log=a.3",
      "--backfill", "other.log=b.1")).backfillFor
    assert(bf == Map("live.log" -> Seq("a.1", "a.2", "a.3"),
      "other.log" -> Seq("b.1")))
    intercept[IllegalArgumentException] { // mixing the two forms is ambiguous
      Exporter.run(spark, Exporter.Config(logs = Seq(live.toString),
        backfill = Seq(arch.toString),
        backfillFor = Map(live.toString -> Seq(arch.toString))))
    }
    intercept[IllegalArgumentException] { // a live= key must be a --log entry
      Exporter.run(spark, Exporter.Config(logs = Seq(live.toString),
        backfillFor = Map("/not/a/member.log" -> Seq(arch.toString))))
    }

    val (server, query) = Exporter.run(spark, Exporter.Config(
      logs = Seq(live.toString), listen = "127.0.0.1:0",
      backfill = Seq(arch.toString)))
    try {
      val deadline = System.nanoTime() + 90000L * 1000000L
      var body = get(s"http://127.0.0.1:${server.boundPort}/metrics")
      while (!body.contains("""clickhouse_query_count{stmt_type="select"} 3""") &&
          System.nanoTime() < deadline) {
        query.processAllAvailable()
        body = get(s"http://127.0.0.1:${server.boundPort}/metrics")
      }
      // history + live correlate in ONE merge: b1's archive lifecycle
      // completed (memory line), all three initials counted, and the live
      // line flowed after the backfill with no re-reads
      assert(body.contains("""clickhouse_query_count{stmt_type="select"} 3"""), body)
      assert(body.contains("chlogexporter_read_lines 4"), body)
    } finally {
      query.stop()
      server.stop(0)
    }
  }

  /** Fleet × backfill: each mapped member drains its own rotated-away
    * archives before its live tail, inside ONE merge with per-server
    * labels — a query lifecycle spanning a member's archive boundary
    * correlates, unmapped members keep the seek-to-EOF default, and a
    * restart re-reads nothing. */
  test("fleet + per-member backfill: --backfill live=arch chains through the fleet merge") {
    val fa = Files.createTempFile("graft-fbf-a", ".log")
    val fb = Files.createTempFile("graft-fbf-b", ".log")
    val fa1 = Files.createTempFile("graft-fbf-a1", ".log")
    val ckpt = Files.createTempDirectory("graft-fbf-ckpt").toString
    val dt = "2024.03.01 12:00:01.000000"
    // a's history: query g1 starts and reports stats in the ARCHIVE…
    Files.write(fa1, (
      s"$dt [ 7 ] {g1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1\n" +
      s"$dt [ 7 ] {g1} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec.\n").getBytes)
    // …and completes in the LIVE file, which with backfill is continuous
    // history (read from 0 despite the EOF default)
    Files.write(fa,
      s"2024.03.01 12:00:03.500000 [ 7 ] {g1} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB.\n".getBytes)
    // the UNMAPPED member keeps the reference's seek-to-EOF default: this
    // pre-existing line must never be counted
    Files.write(fb,
      s"$dt [ 9 ] {skip} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 0\n".getBytes)

    val cfg = Exporter.Config(logs = Seq(fa.toString, fb.toString),
      listen = "127.0.0.1:0", checkpoint = Some(ckpt),
      backfillFor = Map(fa.toString -> Seq(fa1.toString)))
    def srv(p: java.nio.file.Path): String = s"""server="${p.toString}""""
    def append(p: java.nio.file.Path, s: String): Unit =
      Files.write(p, (s + "\n").getBytes, StandardOpenOption.APPEND)
    def poll(q: org.apache.spark.sql.streaming.StreamingQuery,
        port: Int)(pred: String => Boolean): String = {
      val deadline = System.nanoTime() + 90000L * 1000000L
      var body = get(s"http://127.0.0.1:$port/metrics")
      while (!pred(body) && System.nanoTime() < deadline) {
        q.processAllAvailable()
        body = get(s"http://127.0.0.1:$port/metrics")
      }
      body
    }

    val (server, query) = Exporter.run(spark, cfg)
    try {
      // the archive-spanning lifecycle completed: stats from the archive +
      // memory line from the live file correlated under server=fa
      val b1 = poll(query, server.boundPort)(
        _.contains(s"""clickhouse_query_time_count{${srv(fa)},stmt_type="select"} 1"""))
      assert(b1.contains(s"clickhouse_select_query_rows_read_sum{${srv(fa)}} 500"), b1)
      assert(b1.contains(s"chlogexporter_read_lines{${srv(fa)}} 3"), b1)
      // b's pre-existing line stayed unread (EOF default for unmapped members)
      assert(b1.contains(s"chlogexporter_read_lines{${srv(fb)}} 0"), b1)

      // both live tails progress normally after the backfill
      append(fa, s"$dt [ 7 ] {g2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2")
      append(fb, s"$dt [ 9 ] {g2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 3")
      val b2 = poll(query, server.boundPort)(b =>
        b.contains(s"""clickhouse_query_count{${srv(fa)},stmt_type="select"} 2""") &&
          b.contains(s"""clickhouse_query_count{${srv(fb)},stmt_type="select"} 1"""))
      assert(b2.contains(s"chlogexporter_read_lines{${srv(fa)}} 4"), b2)
      assert(b2.contains(s"chlogexporter_read_lines{${srv(fb)}} 1"), b2)
    } finally {
      query.stop()
      server.stop(0)
    }

    // restart on the same checkpoint (same flags): the drained archive is
    // NOT re-read; both members resume from their live offsets
    val (server2, query2) = Exporter.run(spark, cfg)
    try {
      append(fa, s"$dt [ 7 ] {g3} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 4")
      append(fb, s"$dt [ 9 ] {g3} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 5")
      val b3 = poll(query2, server2.boundPort)(b =>
        b.contains(s"""clickhouse_query_count{${srv(fa)},stmt_type="select"} 1""") &&
          b.contains(s"""clickhouse_query_count{${srv(fb)},stmt_type="select"} 1"""))
      assert(b3.contains(s"chlogexporter_read_lines{${srv(fa)}} 1"),
        "restart must resume past the backfilled archive, not re-read it")
      assert(b3.contains(s"chlogexporter_read_lines{${srv(fb)}} 1"), b3)
    } finally {
      query2.stop()
      server2.stop(0)
    }
  }

  test("--drain-and-exit: processes what's present, terminates on its own, healthz flips to 503") {
    val f = Files.createTempFile("graft-exporter-drain", ".log")
    val dt = "2024.03.01 12:00:01.000000"
    Files.write(f, (
      s"$dt [ 7 ] {d1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1\n" +
      s"$dt [ 7 ] {d1} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB.\n" +
      s"$dt [ 7 ] {d2} <Debug> executeQuery: (from 10.0.0.9:9000) INSERT INTO t VALUES (1)\n").getBytes)
    assert(Exporter.parseArgs(Seq("--drain-and-exit")).drainAndExit)
    val (server, query) = Exporter.run(spark, Exporter.Config(
      logs = Seq(f.toString), listen = "127.0.0.1:0",
      fromStart = true, drainAndExit = true))
    try {
      assert(query.awaitTermination(90000), "drain run must terminate by itself")
      val body = get(s"http://127.0.0.1:${server.boundPort}/metrics")
      assert(body.contains("""clickhouse_query_count{stmt_type="select"} 1"""), body)
      assert(body.contains("""clickhouse_query_count{stmt_type="insert"} 1"""), body)
      assert(body.contains("chlogexporter_read_lines 3"), body)
      // the stream is done -> readiness goes 503 (an orchestrator would
      // collect the pod instead of scraping a frozen registry)
      val health = new java.net.URL(s"http://127.0.0.1:${server.boundPort}/healthz")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(health.getResponseCode == 503, "terminated drain is not ready")
      health.disconnect()
    } finally {
      query.stop()
      server.stop(0)
    }
  }

  test("missing log file fails pre-flight before anything starts") {
    intercept[IllegalArgumentException] {
      Exporter.run(spark, Exporter.Config(logs = Seq("/does/not/exist.log")))
    }
  }

  /** Rotate the tailed file mid-run (logrotate move+recreate — the epoch
    * bump path) with scrapes before, DURING the rotation window (file moved
    * aside, replacement not yet written to), and after: every counter must
    * be monotone non-decreasing across the bump — a reset to zero (lost
    * registry) or a re-read of the archived lines (double count) both
    * violate Prometheus counter semantics and break rate() on the scraper
    * side. Shared by the default and RocksDB state-store provider tests. */
  private def rotationScenario(): Unit = {
    val f = Files.createTempFile("graft-exporter-rot", ".log")
    val dt = "2024.03.01 12:00:01.000000"
    val (server, query) = Exporter.run(spark,
      Exporter.Config(logs = Seq(f.toString), listen = "127.0.0.1:0", fromStart = true))
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

      append(s"$dt [ 7 ] {r1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1")
      val b1 = poll(_.contains("""clickhouse_query_count{stmt_type="select"} 1"""))
      assert(b1.contains("chlogexporter_read_lines 1"))

      // classic logrotate: the live file moves aside, a fresh one replaces it
      val aside = f.resolveSibling(f.getFileName.toString + ".1")
      Files.move(f, aside)
      // scrape INSIDE the rotation window (replacement absent): the served
      // registry must hold the pre-rotation values, not reset
      val during = get(s"http://127.0.0.1:${server.boundPort}/metrics")
      assert(during.contains("""clickhouse_query_count{stmt_type="select"} 1"""),
        "counters must survive the rotation window")
      Files.createFile(f)

      append(s"$dt [ 8 ] {r2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2")
      val b2 = poll(_.contains("""clickhouse_query_count{stmt_type="select"} 2"""))
      // monotone: 1 -> 2 (no reset), and read_lines counts exactly the two
      // lines ever written — the archived line was not re-read after the bump
      assert(b2.contains("""clickhouse_query_count{stmt_type="select"} 2"""))
      assert(b2.contains("chlogexporter_read_lines 2"),
        "epoch bump must neither drop nor double-count lines")
    } finally {
      query.stop()
      server.stop(0)
    }
  }

  test("rotation mid-scrape: counters monotone across the epoch bump") {
    rotationScenario()
  }

  test("rotation mid-scrape under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try rotationScenario()
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("exporter end-to-end: tail, merge, scrape, shutdown") {
    val f = Files.createTempFile("graft-exporter", ".log")
    val dt = "2024.03.01 12:00:01.000000"
    val (server, query) = Exporter.run(spark,
      Exporter.Config(logs = Seq(f.toString), listen = "127.0.0.1:0", fromStart = true))
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

  /** The cluster deployment: two server logs, concurrently appended, each
    * rotating independently, through ONE merge and one /metrics endpoint —
    * per-server series, per-server query-id state, offsets resuming across
    * a restart. */
  test("fleet: two rotating server logs through one /metrics endpoint, restart included") {
    val fa = Files.createTempFile("graft-fleet-a", ".log")
    val fb = Files.createTempFile("graft-fleet-b", ".log")
    val ckpt = Files.createTempDirectory("graft-fleet-ckpt").toString
    val dt = "2024.03.01 12:00:01.000000"
    val cfg = Exporter.Config(logs = Seq(fa.toString, fb.toString),
      listen = "127.0.0.1:0", fromStart = true, checkpoint = Some(ckpt))
    def srv(p: java.nio.file.Path): String = s"""server="${p.toString}""""
    def append(p: java.nio.file.Path, s: String): Unit =
      Files.write(p, (s + "\n").getBytes, StandardOpenOption.APPEND)

    val (server, query) = Exporter.run(spark, cfg)
    def poll(q: org.apache.spark.sql.streaming.StreamingQuery,
        port: Int)(pred: String => Boolean): String = {
      val deadline = System.nanoTime() + 90000L * 1000000L
      var body = get(s"http://127.0.0.1:$port/metrics")
      while (!pred(body) && System.nanoTime() < deadline) {
        q.processAllAvailable()
        body = get(s"http://127.0.0.1:$port/metrics")
      }
      body
    }
    try {
      // seeded zero-state series are scrapeable before any line arrives
      val b0 = poll(query, server.boundPort)(
        _.contains(s"chlogexporter_read_lines{${srv(fa)}} 0"))
      assert(b0.contains(s"chlogexporter_read_lines{${srv(fb)}} 0"))
      // HELP/TYPE appear ONCE per family (valid exposition), not per server
      assert("# HELP chlogexporter_read_lines ".r.findAllIn(b0).size == 1)

      // the SAME query id on both servers: state must be per-server — a's
      // select and b's insert are independent lifecycles
      append(fa, s"$dt [ 7 ] {f1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1")
      append(fb, s"$dt [ 9 ] {f1} <Debug> executeQuery: (from 10.0.0.9:9000) INSERT INTO t VALUES (1)")
      val b1 = poll(query, server.boundPort)(b =>
        b.contains(s"""clickhouse_query_count{${srv(fa)},stmt_type="select"} 1""") &&
          b.contains(s"""clickhouse_query_count{${srv(fb)},stmt_type="insert"} 1"""))
      assert(b1.contains(s"chlogexporter_read_lines{${srv(fa)}} 1"))
      assert(b1.contains(s"chlogexporter_read_lines{${srv(fb)}} 1"))

      // complete a's query; b's same-id insert must NOT complete from it
      append(fa, s"$dt [ 7 ] {f1} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec.")
      append(fa, s"2024.03.01 12:00:03.500000 [ 7 ] {f1} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB.")
      val b2 = poll(query, server.boundPort)(
        _.contains(s"""clickhouse_query_time_count{${srv(fa)},stmt_type="select"} 1"""))
      assert(b2.contains(s"""clickhouse_select_query_rows_read_sum{${srv(fa)}} 500"""))
      assert(!b2.contains(s"""clickhouse_query_time_count{${srv(fb)},stmt_type="insert"}"""),
        "b's same-id query must not be completed by a's memory line")

      // rotate a (classic logrotate move+recreate) while b keeps appending
      val aside = fa.resolveSibling(fa.getFileName.toString + ".1")
      Files.move(fa, aside)
      Files.createFile(fa)
      append(fa, s"$dt [ 7 ] {f2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2")
      append(fb, s"$dt [ 9 ] {f2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 3")
      val b3 = poll(query, server.boundPort)(b =>
        b.contains(s"""clickhouse_query_count{${srv(fa)},stmt_type="select"} 2""") &&
          b.contains(s"""clickhouse_query_count{${srv(fb)},stmt_type="select"} 1"""))
      // monotone across the epoch bump; no re-read of the archived lines
      assert(b3.contains(s"chlogexporter_read_lines{${srv(fa)}} 4"))
    } finally {
      query.stop()
      server.stop(0)
    }

    // restart on the same checkpoint: per-file offsets resume (no re-read —
    // the registry is volatile like the reference's, so any re-read would
    // surface as nonzero counts before new lines arrive)
    val (server2, query2) = Exporter.run(spark, cfg)
    try {
      append(fa, s"$dt [ 7 ] {f3} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 4")
      append(fb, s"$dt [ 9 ] {f3} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 5")
      val b4 = poll(query2, server2.boundPort)(b =>
        b.contains(s"""clickhouse_query_count{${srv(fa)},stmt_type="select"} 1""") &&
          b.contains(s"""clickhouse_query_count{${srv(fb)},stmt_type="select"} 1"""))
      assert(b4.contains(s"chlogexporter_read_lines{${srv(fa)}} 1"),
        "restart must resume from the checkpointed offset, not re-read")
      assert(b4.contains(s"chlogexporter_read_lines{${srv(fb)}} 1"))
    } finally {
      query2.stop()
      server2.stop(0)
    }
  }

  test("--jdbc lands the registry in a warehouse table alongside the scrape (one merge, two sinks)") {
    val f = Files.createTempFile("graft-exporter-jdbc", ".log")
    val dt = "2024.03.01 12:00:01.000000"
    val db = s"memory:expjdbc${java.util.UUID.randomUUID().toString.take(8)}"
    val url = s"jdbc:derby:$db;create=true"
    val (server, query) = Exporter.run(spark, Exporter.Config(
      logs = Seq(f.toString), listen = "127.0.0.1:0", fromStart = true,
      jdbcUrl = Some(url)))
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
      append(s"$dt [ 7 ] {j1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1")
      append(s"$dt [ 7 ] {j1} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec.")
      append(s"2024.03.01 12:00:03.500000 [ 7 ] {j1} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB.")
      poll(_.contains("clickhouse_select_query_rows_read_count 1"))

      def jdbcValue(metric: String, labels: String, le: String): Option[Long] = {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.prepareStatement(
            "SELECT value FROM metrics WHERE metric = ? AND labels = ? AND le = ?")
          st.setString(1, metric); st.setString(2, labels); st.setString(3, le)
          val rs = st.executeQuery()
          val v = if (rs.next()) Some(rs.getLong(1)) else None
          st.close(); v
        } finally conn.close()
      }
      // the listener-side delivery delta may land a beat after the scrape
      val deadline = System.nanoTime() + 60000L * 1000000L
      def settled(): Boolean =
        jdbcValue("chlogexporter_read_lines", "", "").contains(3L) &&
          jdbcValue("clickhouse_query_count", "type=select", "").contains(1L)
      while (!settled() && System.nanoTime() < deadline) Thread.sleep(200)
      assert(jdbcValue("clickhouse_query_count", "type=select", "").contains(1L))
      assert(jdbcValue("chlogexporter_read_lines", "", "").contains(3L))
      assert(jdbcValue("clickhouse_select_query_rows_read_sum", "", "").contains(500L))
      assert(jdbcValue("clickhouse_query_time_bucket", "type=select", "5").contains(1L))
      assert(jdbcValue("clickhouse_query_time_count", "type=select", "").contains(1L))
      // exact µs, stored unscaled (2.5 s elapsed)
      assert(jdbcValue("clickhouse_query_time_sum", "type=select", "").contains(2500000L))
      // the zero-filled stats grid is seeded even where nothing was observed
      assert(jdbcValue("clickhouse_select_query_bytes_read_bucket", "", "+Inf").contains(1L))
    } finally {
      query.stop()
      server.stop(0)
    }
  }

  test("--trigger: ProcessingTime cadence stops the quiet-log busy-poll; data still flows") {
    val f = Files.createTempFile("graft-trigger", ".log")
    val dt = "2024.03.01 12:00:01.000000"
    Files.write(f, s"$dt [ 7 ] {t0} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 0\n".getBytes)

    // parse + validation
    assert(Exporter.parseArgs(Seq("--trigger", "5 seconds")).trigger == Some("5 seconds"))
    intercept[IllegalArgumentException] {
      Exporter.run(spark, Exporter.Config(logs = Seq(f.toString),
        trigger = Some("1 second"), drainAndExit = true))
    }
    intercept[IllegalArgumentException] { // malformed interval fails pre-bind
      Exporter.run(spark, Exporter.Config(logs = Seq(f.toString),
        trigger = Some("not an interval")))
    }

    def quietPolls(trigger: Option[String]): Long = {
      val (srv, q) = Exporter.run(spark, Exporter.Config(logs = Seq(f.toString),
        listen = "127.0.0.1:0", fromStart = true, trigger = trigger,
        selfMetrics = false))
      try {
        // let the stream settle on the existing line, then measure a
        // QUIET window: no appends, only trigger-driven offset polls
        q.processAllAvailable()
        Thread.sleep(300)
        val before = graft.sources.TailFileSource.pollsObserved.get()
        Thread.sleep(2400)
        graft.sources.TailFileSource.pollsObserved.get() - before
      } finally { q.stop(); srv.stop(0) }
    }

    val paced = quietPolls(Some("1 second"))
    // 2.4 s at a 1 s cadence: ~2-3 polls; generous bound for CI jitter
    assert(paced <= 8, s"ProcessingTime must pace the quiet poll: $paced polls in 2.4 s")
    val asap = quietPolls(None)
    assert(asap >= 3 * paced.max(1L),
      s"default ASAP busy-polls ($asap) vs paced ($paced) - the knob must matter")

    // and a paced exporter still serves appended data
    val (srv, q) = Exporter.run(spark, Exporter.Config(logs = Seq(f.toString),
      listen = "127.0.0.1:0", fromStart = true, trigger = Some("1 second"),
      selfMetrics = false))
    try {
      Files.write(f, s"$dt [ 7 ] {t1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1\n".getBytes,
        StandardOpenOption.APPEND)
      val deadline = System.nanoTime() + 60000L * 1000000L
      var body = get(s"http://127.0.0.1:${srv.boundPort}/metrics")
      while (!body.contains("""clickhouse_query_count{stmt_type="select"} 2""") &&
          System.nanoTime() < deadline) {
        Thread.sleep(200)
        body = get(s"http://127.0.0.1:${srv.boundPort}/metrics")
      }
      assert(body.contains("""clickhouse_query_count{stmt_type="select"} 2"""))
    } finally { q.stop(); srv.stop(0) }
  }
}
