package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.LogParser
import graft.streaming.{JdbcMetricsWriter, MetricsSink, ParquetMetricsWriter}

/** The pluggable registry sink (BASELINE "ClickHouse sink" north star):
  * the same registry snapshot written through the parquet writer and the
  * JDBC writer (against a REAL embedded Derby database — the ClickHouse
  * JDBC shape without network) must read back identically. */
class MetricsWriterSpec extends SparkSpec {
  import spark.implicits._

  private def registry(): DataFrame = {
    val dt = "2024.03.01 12:00:01.000000"
    val lines = Seq(
      (0L, s"$dt [ 7 ] {w1} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1"),
      (1L, s"$dt [ 7 ] {w1} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec."),
      (2L, s"$dt [ 7 ] {w1} <Error> executeQuery: Code: 60, e.displayText() = DB::Exception: boom"),
      (3L, s"2024.03.01 12:00:03.500000 [ 7 ] {w1} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB."))
    MetricsSink.metricsTable(LogParser.parse(lines.toDF("seq", "value")), readLines = 4L)
  }

  private def key(r: org.apache.spark.sql.Row): (String, String, Option[Double], Double) =
    (r.getAs[String]("metric"), r.getAs[String]("labels"),
      Option(r.getAs[java.lang.Double]("le")).map(_.doubleValue()), r.getAs[Double]("value"))

  test("parquet and JDBC writers land the same registry rows; JDBC survives a snapshot overwrite") {
    val reg = registry().cache()
    val direct = reg.collect().map(key).toSet
    assert(direct.nonEmpty && direct.exists(_._1 == "clickhouse_query_time_bucket"))

    val pqPath = Files.createTempDirectory("graft_reg_pq").toString + "/reg"
    new ParquetMetricsWriter(pqPath).write(reg, batchId = 0L)
    val fromParquet = spark.read.parquet(pqPath).collect().map(key).toSet

    // Derby has no non-finite DOUBLE -> the +Inf bucket needs the sentinel
    // (ClickHouse/Postgres targets pass Inf through, default)
    val inf = Double.MaxValue
    val url = "jdbc:derby:memory:graftreg;create=true"
    val jdbc = new JdbcMetricsWriter(url, "registry", infinitySentinel = Some(inf))
    jdbc.write(reg, batchId = 0L)
    // second snapshot overwrites, like every micro-batch does
    jdbc.write(reg, batchId = 1L)
    val fromJdbc = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "registry").load()
      .collect().map(key).toSet

    val directSentinel = direct.map {
      case (m, l, Some(le), v) if le.isPosInfinity => (m, l, Some(inf), v)
      case r => r
    }
    assert(fromParquet == direct, "parquet round trip must be lossless")
    assert(fromJdbc == directSentinel,
      s"jdbc-only: ${(fromJdbc -- directSentinel).take(3)}; missing: ${(directSentinel -- fromJdbc).take(3)}")
    reg.unpersist()
  }
}
