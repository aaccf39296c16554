package graft

import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, StandardOpenOption}

import scala.io.Source

import graft.streaming.{FleetPromRegistry, MetricsJdbcUpsert, PromRegistry}
import graft.streaming.StreamingMerge.MergeOut

/** Registry resume: an exporter restarted on the same checkpoint + JDBC
  * table seeds its scrape registry from the table snapshot and skips folds
  * for ledger-replayed batches, so the scrape surface CONTINUES monotone
  * across restarts and agrees with the warehouse at every batch boundary. */
class RegistryResumeSpec extends SparkSpec {

  private def get(url: String): String = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    conn.disconnect()
    body
  }

  /** Drive `q` until the scrape body satisfies `pred` (or 90 s). The sleep
    * gives the ASYNC consumers a beat: the JDBC delta lands
    * batch-synchronously, but the listener-fed `graft_*` gauges arrive on
    * the listener bus a moment after processAllAvailable returns — any
    * assertion on those must be part of `pred`, never a bare assert after
    * a registry-only poll. ONE definition for every end-to-end test here. */
  private def pollBody(srv: graft.streaming.MetricsHttpServer,
      q: org.apache.spark.sql.streaming.StreamingQuery)(
      pred: String => Boolean): String = {
    val deadline = System.nanoTime() + 90000L * 1000000L
    var body = get(s"http://127.0.0.1:${srv.boundPort}/metrics")
    while (!pred(body) && System.nanoTime() < deadline) {
      q.processAllAvailable(); Thread.sleep(100)
      body = get(s"http://127.0.0.1:${srv.boundPort}/metrics")
    }
    body
  }

  private def poll(srv: graft.streaming.MetricsHttpServer,
      q: org.apache.spark.sql.streaming.StreamingQuery)(want: String*): String =
    pollBody(srv, q)(b => want.forall(b.contains))

  /** The REAL emission space ([[graft.streaming.StreamingMerge]]'s observe
    * sites) — "counter" never carries type=tail_line (delivery failures are
    * their own pre-aggregated kind since the single-scan fold). */
  private def randomEvents(rnd: scala.util.Random, n: Int,
      server: Option[String]): Seq[MergeOut] = {
    val counters = Seq("not_found_query", "dup_initial_query", "time_parse_error", "convert_error")
    val stmts = Seq("select", "insert", "alter", "show")
    (1 to n).map { _ =>
      rnd.nextInt(8) match {
        case 0 => MergeOut("counter", None, Some(counters(rnd.nextInt(counters.size))),
          server = server)
        case 1 => MergeOut("insert", None, None, stmtType = Some(stmts(rnd.nextInt(stmts.size))),
          server = server)
        case 2 => MergeOut("query_error", None, None,
          stmtType = Some(stmts(rnd.nextInt(stmts.size))),
          errorCode = Some(rnd.nextInt(500).toLong), server = server)
        case 3 => MergeOut("time_obs", None, None,
          stmtType = Some(stmts(rnd.nextInt(stmts.size))),
          elapsedUs = Some(rnd.nextLong(600L * 1000000L)), server = server)
        case 4 => MergeOut("stats_obs", None, None,
          rowsRead = Some(rnd.nextLong(1000000L)), bytesRead = Some(rnd.nextLong(1L << 32)),
          rps = Some(rnd.nextLong(100000L)), speed = Some(rnd.nextLong(1L << 24)),
          server = server)
        case 5 => MergeOut("read_line", None, None, n = 1L + rnd.nextInt(50), server = server)
        case 6 => MergeOut("tail_line", None, None, n = 1L + rnd.nextInt(5), server = server)
        case _ => MergeOut("record", None, None, server = server) // ignored by both sides
      }
    }
  }

  /** [[MetricsJdbcUpsert.deltaRows]] without Spark: contributions grouped
    * and summed — exactly what the table accumulates. */
  private def tableRows(evs: Seq[MergeOut]): Seq[(String, String, String, Long)] =
    evs.flatMap(MetricsJdbcUpsert.contributions)
      .groupBy(r => (r._1, r._2, r._3)).toSeq
      .map { case ((m, l, le), rs) => (m, l, le, rs.map(_._4).sum) }

  test("round-trip: a registry seeded from its own table rows renders byte-identically") {
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 50) {
      val evs = randomEvents(rnd, 1 + rnd.nextInt(120), server = None)
      val live = new PromRegistry
      evs.foreach(live.observe)
      val seeded = new PromRegistry
      // include the observation-independent zero grid the sink seeds — it
      // must be a no-op (every registry renders that grid by construction)
      seeded.seedFrom(MetricsJdbcUpsert.staticGrid ++ tableRows(evs))
      assert(seeded.render() == live.render(), s"case $case_ diverged")
    }
  }

  test("round-trip, fleet form: server-labeled rows route into per-server registries") {
    val rnd = new scala.util.Random(99L)
    for (case_ <- 1 to 20) {
      val evs = Seq("/a.log", "/b.log").flatMap(s =>
        randomEvents(rnd, 1 + rnd.nextInt(60), server = Some(s)))
      val live = new FleetPromRegistry
      evs.foreach(live.observe)
      val seeded = new FleetPromRegistry
      seeded.seedFrom(MetricsJdbcUpsert.staticGrid ++ tableRows(evs))
      assert(seeded.render() == live.render(), s"case $case_ diverged")
    }
  }

  for (backend <- JdbcBackends.all)
  test(s"exporter restart with --resume-from-jdbc: counters continue; replayed batch folds exactly once [${backend.name}]") {
    val f = Files.createTempFile("graft-resume", ".log")
    val ckpt = Files.createTempDirectory("graft-resume-ckpt").toString
    val db = s"resume${java.util.UUID.randomUUID().toString.take(8)}"
    val url = backend.url(db)
    val dt = "2024.03.01 12:00:01.000000"
    def append(s: String): Unit =
      Files.write(f, (s + "\n").getBytes, StandardOpenOption.APPEND)
    def metric(body: String, line: String): Boolean = body.contains(line)
    def config = Exporter.Config(logs = Seq(f.toString), listen = "127.0.0.1:0",
      fromStart = true, checkpoint = Some(ckpt), jdbcUrl = Some(url),
      selfMetrics = false)

    // run 1: two selects land in registry AND table
    append(s"$dt [ 7 ] {r1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1")
    append(s"$dt [ 7 ] {r2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2")
    val (srv1, q1) = Exporter.run(spark, config)
    try poll(srv1, q1)("""clickhouse_query_count{stmt_type="select"} 2""")
    finally { q1.stop(); srv1.stop(0) }

    val t = MetricsJdbcUpsert.Target(url, "metrics")
    val src = MetricsJdbcUpsert.ledgerSource(ckpt)

    // simulate the crash window: a batch whose delta COMMITTED to the sink
    // but whose checkpoint commit was lost — on restart Spark re-delivers
    // that batch id, the ledger skips the table write, and the RESUMED
    // registry must skip the fold too (its seed already contains the +5)
    val nextBatch = {
      val conn = t.connect()
      try {
        val rs = conn.createStatement().executeQuery(
          s"SELECT MAX(batch_id) FROM ${t.ledger} WHERE source = '$src'")
        rs.next(); rs.getLong(1) + 1L
      } finally conn.close()
    }
    assert(MetricsJdbcUpsert.applyDelta(t, src, nextBatch,
      Seq(("clickhouse_query_count", "type=select", "", 5L),
        ("chlogexporter_read_lines", "", "", 5L))))

    // the line the "crashed" batch counted, re-delivered on restart
    append(s"$dt [ 7 ] {r3} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 3")

    val (srv2, q2) = Exporter.run(spark, config.copy(resumeFromJdbc = true))
    try {
      // drive the replayed batch to COMPLETION before asserting — the skip
      // must hold after the batch ran, not just at seed time
      q2.processAllAvailable()
      val body = get(s"http://127.0.0.1:${srv2.boundPort}/metrics")
      // seeded 2 + the pre-committed 5; the replayed batch's fold is SKIPPED
      // (a double fold would read 8)
      assert(metric(body, """clickhouse_query_count{stmt_type="select"} 7"""),
        s"resume must seed 2, add the committed 5, and not re-fold the replay: $body")
      assert(metric(body, "chlogexporter_read_lines 7"),
        s"read_lines: 2 seeded + 5 committed, replay skipped: $body")
      // the scrape surface equals a fresh registry over the table snapshot —
      // scrape and warehouse agree at the batch boundary, byte for byte
      val fromTable = new PromRegistry
      fromTable.seedFrom(MetricsJdbcUpsert.snapshot(t))
      assert(get(s"http://127.0.0.1:${srv2.boundPort}/metrics") == fromTable.render(),
        "scrape and table must agree after the replayed batch")
    } finally { q2.stop(); srv2.stop(0) }

    // control: a restart WITHOUT resume keeps the reference's volatile
    // registry — counters restart from the post-restart corpus only
    append(s"$dt [ 7 ] {r4} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 4")
    val (srv3, q3) = Exporter.run(spark, config)
    try {
      val body = poll(srv3, q3)("""clickhouse_query_count{stmt_type="select"} 1""")
      assert(metric(body, """clickhouse_query_count{stmt_type="select"} 1"""),
        s"without resume the registry is volatile, like the reference: $body")
    } finally { q3.stop(); srv3.stop(0) }
  }

  for (backend <- JdbcBackends.all)
  test(s"append dialect through the exporter: deltas land fold-on-read; resume seeds from the folded view [${backend.name}]") {
    import graft.streaming.{AppendJdbcSink, MetricsJdbcAppend}
    val f = Files.createTempFile("graft-resume-app", ".log")
    val ckpt = Files.createTempDirectory("graft-resume-app-ckpt").toString
    val db = s"resumeapp${java.util.UUID.randomUUID().toString.take(8)}"
    val url = backend.url(db)
    val dt = "2024.03.01 12:00:01.000000"
    def append(s: String): Unit =
      Files.write(f, (s + "\n").getBytes, StandardOpenOption.APPEND)
    def config = Exporter.Config(logs = Seq(f.toString), listen = "127.0.0.1:0",
      fromStart = true, checkpoint = Some(ckpt), jdbcUrl = Some(url),
      jdbcDialect = "append", selfMetrics = false)
    assert(Exporter.parseArgs(Seq("--jdbc-dialect", "append")).jdbcDialect == "append")
    intercept[IllegalArgumentException] {
      graft.streaming.MetricsJdbcSink("bogus", url, "metrics")
    }

    append(s"$dt [ 7 ] {a1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1")
    append(s"$dt [ 7 ] {a2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2")
    val (srv1, q1) = Exporter.run(spark, config)
    try {
      val deadline = System.nanoTime() + 90000L * 1000000L
      var body = get(s"http://127.0.0.1:${srv1.boundPort}/metrics")
      while (!body.contains("""clickhouse_query_count{stmt_type="select"} 2""") &&
          System.nanoTime() < deadline) {
        q1.processAllAvailable(); Thread.sleep(100)
        body = get(s"http://127.0.0.1:${srv1.boundPort}/metrics")
      }
      assert(body.contains("""clickhouse_query_count{stmt_type="select"} 2"""))
    } finally { q1.stop(); srv1.stop(0) }

    // the folded view (what a ClickHouse deployment queries) agrees with
    // the registry, and is what resume seeds from
    val sink = AppendJdbcSink(MetricsJdbcAppend.Target(url, "metrics"))
    assert(sink.snapshot().exists {
      case ("clickhouse_query_count", "type=select", "", 2L) => true
      case _ => false
    }, s"folded view must hold the summed deltas: ${sink.snapshot().take(10)}")

    append(s"$dt [ 7 ] {a3} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 3")
    val (srv2, q2) = Exporter.run(spark, config.copy(resumeFromJdbc = true))
    try {
      q2.processAllAvailable()
      Thread.sleep(100)
      val body = get(s"http://127.0.0.1:${srv2.boundPort}/metrics")
      assert(body.contains("""clickhouse_query_count{stmt_type="select"} 3"""),
        s"resume must seed 2 from the folded view and fold the new 1: $body")
      // scrape ≡ the folded view at the batch boundary, byte for byte
      val fromView = new PromRegistry
      fromView.seedFrom(sink.snapshot())
      assert(get(s"http://127.0.0.1:${srv2.boundPort}/metrics") == fromView.render())
    } finally { q2.stop(); srv2.stop(0) }
  }

  test("fleet resume: per-server counters continue across a restart, routed from server-labeled rows") {
    val a = Files.createTempFile("graft-fleet-resume-a", ".log")
    val b = Files.createTempFile("graft-fleet-resume-b", ".log")
    val ckpt = Files.createTempDirectory("graft-fleet-resume-ckpt").toString
    val db = s"memory:fleetresume${java.util.UUID.randomUUID().toString.take(8)}"
    val url = s"jdbc:derby:$db;create=true"
    val dt = "2024.03.01 12:00:01.000000"
    def config = Exporter.Config(logs = Seq(a.toString, b.toString),
      listen = "127.0.0.1:0", fromStart = true, checkpoint = Some(ckpt),
      jdbcUrl = Some(url), selfMetrics = false)
    def append(f: java.nio.file.Path, s: String): Unit =
      Files.write(f, (s + "\n").getBytes, StandardOpenOption.APPEND)

    // run 1: two selects on a, one on b
    append(a, s"$dt [ 7 ] {f1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1")
    append(a, s"$dt [ 7 ] {f2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2")
    append(b, s"$dt [ 7 ] {f1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 3")
    val (srv1, q1) = Exporter.run(spark, config)
    try poll(srv1, q1)(
      s"""clickhouse_query_count{server="$a",stmt_type="select"} 2""",
      s"""clickhouse_query_count{server="$b",stmt_type="select"} 1""")
    finally { q1.stop(); srv1.stop(0) }

    // restart with resume: each server's counters seed from ITS rows and
    // keep counting independently
    append(b, s"$dt [ 7 ] {f9} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 9")
    val (srv2, q2) = Exporter.run(spark, config.copy(resumeFromJdbc = true))
    try {
      // the seeded values are served before the first post-restart batch
      val seeded = get(s"http://127.0.0.1:${srv2.boundPort}/metrics")
      assert(seeded.contains(
        s"""clickhouse_query_count{server="$a",stmt_type="select"} 2"""),
        s"seed must serve per-server values at start: $seeded")
      val body = poll(srv2, q2)(
        s"""clickhouse_query_count{server="$b",stmt_type="select"} 2""")
      assert(body.contains(
        s"""clickhouse_query_count{server="$a",stmt_type="select"} 2"""),
        s"an idle server's counters must persist, not reset: $body")
      assert(body.contains(s"""chlogexporter_read_lines{server="$a"} 2"""))
      assert(body.contains(s"""chlogexporter_read_lines{server="$b"} 2"""))
    } finally { q2.stop(); srv2.stop(0) }
  }

  test("fleet x append dialect x resume: server-labeled deltas fold on read and seed per server") {
    import graft.streaming.{AppendJdbcSink, MetricsJdbcAppend}
    val a = Files.createTempFile("graft-fa-app", ".log")
    val b = Files.createTempFile("graft-fb-app", ".log")
    val ckpt = Files.createTempDirectory("graft-fapp-ckpt").toString
    val db = s"memory:fleetapp${java.util.UUID.randomUUID().toString.take(8)}"
    val url = s"jdbc:derby:$db;create=true"
    val dt = "2024.03.01 12:00:01.000000"
    def config = Exporter.Config(logs = Seq(a.toString, b.toString),
      listen = "127.0.0.1:0", fromStart = true, checkpoint = Some(ckpt),
      jdbcUrl = Some(url), jdbcDialect = "append", selfMetrics = false)

    Files.write(a,
      s"$dt [ 7 ] {ga1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1\n".getBytes)
    Files.write(b,
      s"$dt [ 7 ] {gb1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2\n".getBytes)
    val (srv1, q1) = Exporter.run(spark, config)
    val wantA = s"""clickhouse_query_count{server="$a",stmt_type="select"} 1"""
    val wantB = s"""clickhouse_query_count{server="$b",stmt_type="select"} 1"""
    try {
      // assert BOTH after the poll: a server-b ingestion failure must fail
      // HERE, not surface later as a misleading resume-path assert
      val body = poll(srv1, q1)(wantA, wantB)
      assert(body.contains(wantA), s"server a's line must land in run 1: $body")
      assert(body.contains(wantB), s"server b's line must land in run 1: $body")
    } finally { q1.stop(); srv1.stop(0) }

    // the folded view carries per-server rows
    val sink = AppendJdbcSink(MetricsJdbcAppend.Target(url, "metrics"))
    assert(sink.snapshot().exists {
      case ("clickhouse_query_count", l, "", 1L) => l == s"server=$a,type=select"
      case _ => false
    }, s"server-labeled folded rows expected: ${sink.snapshot().filter(_._4 != 0L).take(8)}")

    // restart with resume: per-server seeds from the view, both continue
    Files.write(b,
      s"$dt [ 7 ] {gb2} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 9\n".getBytes,
      StandardOpenOption.APPEND)
    val (srv2, q2) = Exporter.run(spark, config.copy(resumeFromJdbc = true))
    try {
      q2.processAllAvailable()
      Thread.sleep(200)
      val body = get(s"http://127.0.0.1:${srv2.boundPort}/metrics")
      assert(body.contains(wantA), s"idle server seeded from the view: $body")
      assert(body.contains(
        s"""clickhouse_query_count{server="$b",stmt_type="select"} 2"""),
        s"active server continues from its seeded value: $body")
    } finally { q2.stop(); srv2.stop(0) }
  }

  test("capstone: capped drain + rotation while down + resume — counters exact, nothing re-read") {
    val f = Files.createTempFile("graft-capstone", ".log")
    val ckpt = Files.createTempDirectory("graft-capstone-ckpt").toString
    val db = s"memory:capstone${java.util.UUID.randomUUID().toString.take(8)}"
    val url = s"jdbc:derby:$db;create=true"
    val dt = "2024.03.01 12:00:01.000000"
    def line(i: Int) = s"$dt [ 7 ] {cs$i} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT $i"
    def config = Exporter.Config(logs = Seq(f.toString), listen = "127.0.0.1:0",
      fromStart = true, checkpoint = Some(ckpt), jdbcUrl = Some(url),
      maxBytesPerTrigger = 100) // ~one 90-byte line admitted per poll
    // the multi-batch proof reads a LISTENER-fed gauge: poll on it (the
    // listener bus lags processAllAvailable), never bare-assert it
    def multiBatch(b: String): Boolean =
      "(?m)^graft_batches_total (\\d+)$".r.findFirstMatchIn(b)
        .exists(_.group(1).toLong >= 3L)

    // phase 1: four lines drained through ~100-byte micro-batches
    Files.write(f, (1 to 4).map(line).mkString("", "\n", "\n").getBytes)
    val (srv1, q1) = Exporter.run(spark, config)
    try {
      val b1 = pollBody(srv1, q1)(b =>
        b.contains("chlogexporter_read_lines 4") && multiBatch(b))
      assert(b1.contains("""clickhouse_query_count{stmt_type="select"} 4"""))
      // the cap forced a multi-batch drain (self-telemetry rides along)
      assert(multiBatch(b1), s"4 lines / 100B budget needs >2 batches: $b1")
    } finally { q1.stop(); srv1.stop(0) }

    // phase 2, while the exporter is DOWN: classic logrotate move+recreate
    val aside = f.resolveSibling(f.getFileName.toString + ".1")
    Files.move(f, aside)
    Files.createFile(f)
    Files.write(f, (5 to 6).map(line).mkString("", "\n", "\n").getBytes)

    // phase 3: restart with resume — the checkpointed fileKey identifies the
    // rotation that happened offline (epoch bump, read the NEW file from 0),
    // the seed restores the four counted lines, the capped drain adds two
    val (srv2, q2) = Exporter.run(spark, config.copy(resumeFromJdbc = true))
    try {
      // the backlog gauge is listener-fed too: part of the poll predicate
      val b2 = pollBody(srv2, q2)(b =>
        b.contains("chlogexporter_read_lines 6") &&
          b.contains("graft_tail_backlog_bytes 0"))
      assert(b2.contains("""clickhouse_query_count{stmt_type="select"} 6"""),
        s"4 resumed + 2 new, archived lines never re-read: $b2")
      // backlog gauge drained on the NEW epoch
      assert(b2.contains("graft_tail_backlog_bytes 0"), b2)
      // scrape ≡ warehouse after everything
      val t = MetricsJdbcUpsert.Target(url, "metrics")
      val fromTable = new PromRegistry
      fromTable.seedFrom(MetricsJdbcUpsert.snapshot(t))
      val served = get(s"http://127.0.0.1:${srv2.boundPort}/metrics")
      assert(served.startsWith(fromTable.render()),
        "data families must equal the table rendering (telemetry block follows)")
    } finally { q2.stop(); srv2.stop(0) }
  }

  test("--jdbc-compact-every keeps the append table bounded while the scrape stays exact") {
    import graft.streaming.MetricsJdbcAppend
    val f = Files.createTempFile("graft-compact-cli", ".log")
    val ckpt = Files.createTempDirectory("graft-compact-cli-ckpt").toString
    val db = s"memory:compactcli${java.util.UUID.randomUUID().toString.take(8)}"
    val url = s"jdbc:derby:$db;create=true"
    val dt = "2024.03.01 12:00:01.000000"
    assert(Exporter.parseArgs(Seq("--jdbc-compact-every", "2")).jdbcCompactEvery == 2)
    val (srv, q) = Exporter.run(spark, Exporter.Config(
      logs = Seq(f.toString), listen = "127.0.0.1:0", fromStart = true,
      checkpoint = Some(ckpt), jdbcUrl = Some(url), jdbcDialect = "append",
      jdbcCompactEvery = 2, selfMetrics = false))
    try {
      // six separate micro-batches (one appended line each, drained between)
      for (i <- 1 to 6) {
        Files.write(f,
          s"$dt [ 7 ] {c$i} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT $i\n".getBytes,
          StandardOpenOption.APPEND)
        q.processAllAvailable()
      }
      val deadline = System.nanoTime() + 90000L * 1000000L
      var body = get(s"http://127.0.0.1:${srv.boundPort}/metrics")
      while (!body.contains("""clickhouse_query_count{stmt_type="select"} 6""") &&
          System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
        body = get(s"http://127.0.0.1:${srv.boundPort}/metrics")
      }
      assert(body.contains("""clickhouse_query_count{stmt_type="select"} 6"""))

      val t = MetricsJdbcAppend.Target(url, "metrics")
      val src = graft.streaming.MetricsJdbcUpsert.ledgerSource(ckpt)
      val conn = t.connect()
      val (realBatches, totalBatches) = try {
        def one(sql: String): Long = {
          val rs = conn.createStatement().executeQuery(sql)
          rs.next(); rs.getLong(1)
        }
        (one(s"SELECT COUNT(DISTINCT batch_id) FROM ${t.deltas} " +
          s"WHERE source = '$src' AND metric <> '__batch_marker'"),
         one(s"SELECT COUNT(DISTINCT batch_id) FROM ${t.deltas} WHERE source = '$src'"))
      } finally conn.close()
      // ≥6 applied batches compacted every 2: real delta rows live under at
      // most compactEvery batch ids; every id keeps a presence row
      assert(realBatches <= 2L,
        s"compaction must bound the uncompacted tail: $realBatches real-batch ids")
      assert(totalBatches >= 6L, "every batch id must stay probed-seen")
      // and the folded view still equals what the registry serves
      val fromView = new PromRegistry
      fromView.seedFrom(graft.streaming.AppendJdbcSink(t).snapshot())
      assert(get(s"http://127.0.0.1:${srv.boundPort}/metrics") == fromView.render())
    } finally { q.stop(); srv.stop(0) }
  }

  // ---- resume guards (r9 ADVICE): a resume must fail loudly instead of
  // serving another pipeline's (or another topology's) counters ----

  test("seedFrom rejects fleet-written rows in a single-file registry") {
    val reg = new PromRegistry
    val e = intercept[IllegalArgumentException] {
      reg.seedFrom(Seq(("chlogexporter_read_lines", "server=/a.log", "", 42L)))
    }
    assert(e.getMessage.contains("FLEET"))
    // ...including a server label that is not the leading one
    val e2 = intercept[IllegalArgumentException] {
      reg.seedFrom(Seq(("clickhouse_query_count", "type=select,server=/a.log", "", 1L)))
    }
    assert(e2.getMessage.contains("FLEET"))
  }

  test("seedFrom rejects malformed label cells with a clear error") {
    val reg = new PromRegistry
    val e = intercept[IllegalArgumentException] {
      reg.seedFrom(Seq(("chlogexporter_errors", "not-a-label-cell", "", 3L)))
    }
    assert(e.getMessage.contains("unparseable label cell"))
  }

  test("fleet seedFrom rejects single-exporter-written rows") {
    val fleet = new FleetPromRegistry
    // labeled row without server= prefix
    intercept[IllegalArgumentException] {
      fleet.seedFrom(Seq(("clickhouse_query_count", "type=select", "", 5L)))
    }
    // unlabeled NONZERO row (single exporter's read_lines; the zero grid
    // is the only legitimate server-less content)
    intercept[IllegalArgumentException] {
      fleet.seedFrom(Seq(("chlogexporter_read_lines", "", "", 7L)))
    }
    // the zero grid itself stays a no-op
    fleet.seedFrom(MetricsJdbcUpsert.staticGrid)
  }

  test("verifyResumable refuses a table shared by another pipeline's ledger source") {
    val db = s"memory:shared${java.util.UUID.randomUUID().toString.take(8)}"
    for (dialect <- Seq("upsert", "append")) {
      val url = s"jdbc:derby:${db}$dialect;create=true"
      val sink = graft.streaming.MetricsJdbcSink(dialect, url, "metrics")
      sink.ensureTables()
      val mine = "q1234567890abcd"
      val rows = Seq(("clickhouse_query_count", "type=select", "", 1L))
      assert(dialect match {
        case "upsert" => MetricsJdbcUpsert.applyDelta(
          MetricsJdbcUpsert.Target(url, "metrics"), mine, 0L, rows)
        case _ => graft.streaming.MetricsJdbcAppend.applyDelta(
          graft.streaming.MetricsJdbcAppend.Target(url, "metrics"), mine, 0L, rows)
      })
      // own source (+ the zero-grid seed) is resumable
      sink.verifyResumable(mine)
      // a second pipeline's contribution poisons the whole-table snapshot
      val other = "qfedcba098765432"
      dialect match {
        case "upsert" => MetricsJdbcUpsert.applyDelta(
          MetricsJdbcUpsert.Target(url, "metrics"), other, 0L, rows)
        case _ => graft.streaming.MetricsJdbcAppend.applyDelta(
          graft.streaming.MetricsJdbcAppend.Target(url, "metrics"), other, 0L, rows)
      }
      val e = intercept[IllegalArgumentException](sink.verifyResumable(mine))
      assert(e.getMessage.contains(other))
    }
  }

  test("zero-member fleet renders headers-only (no label-free series identity flip)") {
    val empty = new FleetPromRegistry
    val body = empty.render()
    assert(body.contains("# HELP chlogexporter_read_lines"))
    assert(body.contains("# TYPE clickhouse_select_query_rows_read histogram"))
    // no sample lines at all: every non-comment line would be a label-free
    // series that later re-appears server-labeled (a new-series flip)
    assert(body.linesIterator.forall(l => l.isEmpty || l.startsWith("#")),
      s"unexpected sample line in zero-member exposition:\n$body")
    // the first member joining brings the server-labeled zero grid
    empty.seed("/a.log")
    val one = empty.render()
    assert(one.contains("""chlogexporter_read_lines{server="/a.log"} 0"""))
  }
}
