package graft

import java.nio.file.Files

import graft.operators.LogParser
import graft.sources.LogSource
import graft.streaming.MetricsSink

/** S2 pre-flight validation + S4 exposition rendering. */
class MetricsSinkSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "2024.03.01 12:00:01.000000 [ 7 ] {m1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1"),
    (1L, "2024.03.01 12:00:01.500000 [ 7 ] {m1} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec."),
    (2L, "2024.03.01 12:00:02.000000 [ 7 ] {m1} <Error> executeQuery: Code: 60, e.displayText() = DB::Exception: boom"),
    (3L, "2024.03.01 12:00:03.500000 [ 7 ] {m1} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB."),
    (4L, "2024.03.01 12:00:04.000000 [ 8 ] {m2} <Information> executeQuery: Read 1 rows, 1 B in 0.100 sec., 1 rows/sec., 1 B/sec."))

  test("prometheus text exposition: counters, cumulative buckets, _sum/_count") {
    val parsed = LogParser.parse(corpus.toDF("seq", "value"))
    val text = MetricsSink.exposition(parsed, readLines = corpus.size.toLong)
    assert(text.contains("chlogexporter_read_lines 5"))
    assert(text.contains("""chlogexporter_errors{type="not_found_query"} 1"""))
    assert(text.contains("""clickhouse_query_count{stmt_type="select"} 1"""))
    assert(text.contains("""clickhouse_query_errors{stmt_type="select",error_code="60"} 1"""))
    // 2.5s elapsed -> first nonzero cumulative bucket is le=5, +Inf matches count
    assert(text.contains("""clickhouse_query_time_bucket{stmt_type="select",le="1"} 0"""))
    assert(text.contains("""clickhouse_query_time_bucket{stmt_type="select",le="5"} 1"""))
    assert(text.contains("""clickhouse_query_time_bucket{stmt_type="select",le="+Inf"} 1"""))
    assert(text.contains("""clickhouse_query_time_sum{stmt_type="select"} 2.5"""))
    assert(text.contains("""clickhouse_query_time_count{stmt_type="select"} 1"""))
    assert(text.contains("""clickhouse_select_query_rows_read_bucket{le="1000000"} 1"""))
    assert(text.contains("clickhouse_select_query_rows_read_sum 500"))
    assert(text.contains("clickhouse_select_query_rows_read_count 1"))
  }

  test("checkLogFile: plain file passes, directory and gzip rejected") {
    val dir = Files.createTempDirectory("graft_src")
    val ok = dir.resolve("server.log")
    Files.write(ok, "hello\n".getBytes)
    LogSource.checkLogFile(ok.toString) // no throw

    intercept[IllegalArgumentException](LogSource.checkLogFile(dir.toString))
    intercept[IllegalArgumentException](LogSource.checkLogFile(dir.resolve("missing.log").toString))

    val gz = dir.resolve("server.log.gz")
    Files.write(gz, Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00))
    intercept[IllegalArgumentException](LogSource.checkLogFile(gz.toString))
  }

  test("readText: seq is the exact line number") {
    val dir = Files.createTempDirectory("graft_src2")
    val f = dir.resolve("server.log")
    Files.write(f, (0 until 100).map(i => s"line-$i").mkString("\n").getBytes)
    val rows = LogSource.readText(spark, f.toString).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 100)
    assert(rows(0L) == "line-0" && rows(99L) == "line-99")
  }
}
