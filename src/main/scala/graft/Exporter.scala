package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{MetricsHttpServer, MetricsServing}

/** The reference binary, Spark-native: tail-follow ONE ClickHouse server
  * log (`tail -f` semantics, seek-to-EOF default), correlate its per-query
  * lines through the keyed stateful merge, and serve the Prometheus metric
  * surface over HTTP — flag-for-flag the CLI of
  * /root/reference/main.go:17-21 (`--log`, `--listen`, `--from-start`).
  *
  * A user of the reference runs
  * `spark-submit --class graft.Exporter <jar> --log /var/log/clickhouse-server/clickhouse-server.log`
  * where they ran the Go binary; scrape `GET /metrics` on `--listen`
  * (default 0.0.0.0:19901, main.go:20) exactly as before. SIGINT/SIGTERM
  * shut down the stream, then the HTTP server, mirroring main.go:130-142.
  *
  * Beyond the reference: `--jdbc <url> [--jdbc-table <name>]` additionally
  * lands every micro-batch's metric delta exactly-once in a warehouse
  * table off the SAME merge and checkpoint
  * ([[graft.streaming.MetricsJdbcUpsert]] — the BASELINE "Structured
  * Streaming + warehouse sink" shape). The writer's exactly-once
  * mechanism needs a transactional JDBC backend (Derby is what the specs
  * drive; PostgreSQL/MySQL fit the same contract); ClickHouse itself
  * needs the append-only SummingMergeTree mapping described in the
  * writer's scaladoc, not this upsert.
  */
object Exporter {

  final case class Config(
      log: String = "/var/log/clickhouse-server/clickhouse-server.log",
      listen: String = "0.0.0.0:19901",
      fromStart: Boolean = false,
      checkpoint: Option[String] = None,
      jdbcUrl: Option[String] = None,
      jdbcTable: String = "metrics")

  def parseArgs(args: Seq[String]): Config = {
    def loop(rest: List[String], c: Config): Config = rest match {
      case "--log" :: v :: t => loop(t, c.copy(log = v))
      case "--listen" :: v :: t => loop(t, c.copy(listen = v))
      case "--from-start" :: t => loop(t, c.copy(fromStart = true))
      case "--checkpoint" :: v :: t => loop(t, c.copy(checkpoint = Some(v)))
      // beyond-reference: land the metric registry in a warehouse table
      // (the BASELINE warehouse-sink north star) alongside the scrape —
      // any TRANSACTIONAL JDBC backend (specs drive embedded Derby; see
      // MetricsJdbcUpsert's scaladoc for the ClickHouse-native mapping)
      case "--jdbc" :: v :: t => loop(t, c.copy(jdbcUrl = Some(v)))
      case "--jdbc-table" :: v :: t => loop(t, c.copy(jdbcTable = v))
      case Nil => c
      case other :: _ => throw new IllegalArgumentException(
        s"unknown flag: $other (supported: --log <file> --listen <host:port> " +
          "--from-start --checkpoint <dir> --jdbc <url> --jdbc-table <name>)")
    }
    loop(args.toList, Config())
  }

  /** Start the server + pipeline; returns both for lifecycle control
    * (tests drive this directly; [[main]] blocks on the query). */
  def run(spark: SparkSession, config: Config): (MetricsHttpServer, StreamingQuery) = {
    graft.sources.LogSource.checkLogFile(config.log) // pre-flight, main.go:81-85
    val (host, port) = config.listen.split(":", 2) match {
      case Array(h, p) => (h, p.toInt)
      case _ => throw new IllegalArgumentException(s"bad --listen: ${config.listen}")
    }
    val server = new MetricsHttpServer(port, host).start() // before the tail attaches, main.go:78
    val ckpt = config.checkpoint.getOrElse(
      Files.createTempDirectory("graft-exporter-ckpt").toString)
    val query = MetricsServing.serveIncrementalTail(
      spark, config.log, server, ckpt, fromStart = config.fromStart,
      jdbc = config.jdbcUrl.map(u =>
        graft.streaming.MetricsJdbcUpsert.Target(u, config.jdbcTable)))
    (server, query)
  }

  def main(args: Array[String]): Unit = {
    val config = parseArgs(args.toSeq)
    val spark = SparkSession.builder()
      .appName("prometheus-clickhouselog-exporter")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val (server, query) = run(spark, config)
    // graceful shutdown à la main.go:130-142: stop the tail, drain scrapes
    sys.addShutdownHook {
      try query.stop() finally server.stop(2)
    }
    query.awaitTermination()
  }
}
