package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.operators.{LogParser, QueryMerge}
import graft.sources.LogSource

/** S2 pre-flight validation (reference main.go:29-53, including the fixed
  * is-directory bug) and the S3 tail-error side channel (main.go:113-117). */
class LogSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("checkLogFile: missing path rejected (os.Stat branch)") {
    val e = intercept[IllegalArgumentException] {
      LogSource.checkLogFile("/does/not/exist.log")
    }
    assert(e.getMessage.contains("Can't stat"))
  }

  test("checkLogFile: directory rejected (the reference's is-dir branch returns nil — fixed here)") {
    val dir = tmp("graft-dir")
    val e = intercept[IllegalArgumentException] {
      LogSource.checkLogFile(dir.toString)
    }
    assert(e.getMessage.contains("directory"))
  }

  test("checkLogFile: gzip magic rejected, zip magic rejected (filetype.IsArchive analog)") {
    val gz = Files.createTempFile("graft", ".log")
    Files.write(gz, Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00, 0x42))
    val e = intercept[IllegalArgumentException] { LogSource.checkLogFile(gz.toString) }
    assert(e.getMessage.contains("archive"))

    val zip = Files.createTempFile("graft", ".log")
    Files.write(zip, Array[Byte](0x50, 0x4b, 0x03, 0x04, 0x42))
    intercept[IllegalArgumentException] { LogSource.checkLogFile(zip.toString) }
  }

  test("checkLogFile: plain log file (even empty, even short) passes") {
    val f = Files.createTempFile("graft", ".log")
    LogSource.checkLogFile(f.toString) // empty
    Files.write(f, "2024.03.01 12:00:01.123456 [ 1 ] {q} <Debug> x\n".getBytes)
    LogSource.checkLogFile(f.toString)
  }

  test("readText assigns exact line-number seq after validation") {
    val f = Files.createTempFile("graft", ".log")
    Files.write(f, "line a\nline b\nline c\n".getBytes)
    val rows = LogSource.readText(spark, f.toString)
      .orderBy("seq").as[(Long, String)].collect().toSeq
    assert(rows == Seq((0L, "line a"), (1L, "line b"), (2L, "line c")))
  }

  private val initial =
    "2024.03.01 12:00:01.123456 [ 123 ] {q1} <Debug> executeQuery: (from 10.0.0.1:9000, user: default) SELECT 1"

  test("tail_line side channel: delivery failures counted, kept from the parser") {
    val corrupt = "garbage �� bytes <Debug> executeQuery"
    val longLine = "x" * (LogSource.MaxLineBytes + 1)
    val lines = Seq((0L, initial), (1L, corrupt), (2L, longLine))
      .toDF("seq", "value")

    val delivered = LogSource.withDelivery(lines)
    assert(delivered.filter(col("tail_ok")).count() == 1)
    assert(delivered.filter(!col("tail_ok")).count() == 2)

    // all four reference label values can now exist in the counter-vec
    val parsed = LogParser.parse(delivered.filter(col("tail_ok")).select("seq", "value"))
    val counters = QueryMerge.errorCountersWithTail(parsed, delivered)
      .as[(String, Long)].collect().toMap
    assert(counters("tail_line") == 2L)

    // clean corpus: no tail_line row (counter-vec label exists once incremented)
    val cleanCounters = QueryMerge.errorCountersWithTail(
      parsed, LogSource.withDelivery(Seq((0L, initial)).toDF("seq", "value")))
      .as[(String, Long)].collect().toMap
    assert(!cleanCounters.contains("tail_line"))
  }
}
