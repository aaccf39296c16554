package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.LogParser

/** Golden-fixture tests for the 4-pattern parser (FIXTURES.md §1 lines,
  * validated against the reference regexes at query.go:15-18). */
class LogParserSpec extends SparkSpec {
  import spark.implicits._

  private val initial =
    "2024.03.01 12:00:01.123456 [ 123 ] {a1b2c3d4-e5f6-0001} <Debug> executeQuery: (from 10.0.0.1:9000, user: default) SELECT count() FROM hits WHERE d > today()"
  private val stats =
    "2024.03.01 12:00:02.000000 [ 123 ] {a1b2c3d4-e5f6-0001} <Information> executeQuery: Read 1000000 rows, 1.23 GiB in 0.456 sec., 2192982 rows/sec., 2.70 GiB/sec."
  private val memory =
    "2024.03.01 12:00:02.100000 [ 123 ] {a1b2c3d4-e5f6-0001} <Debug> MemoryTracker: Peak memory usage (for query): 1.05 GiB."
  private val error =
    "2024.03.01 12:00:03.000000 [ 124 ] {ffff-0002} <Error> executeQuery: Code: 60, e.displayText() = DB::Exception: Table default.missing does not exist."

  private def parse(lines: String*) =
    LogParser.parse(lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("seq", "value")).collect().toSeq

  test("initial line: all seven groups extracted and typed") {
    val Seq(r) = parse(initial)
    assert(r.getAs[String]("kind") == "initial")
    assert(r.getAs[String]("id") == "a1b2c3d4-e5f6-0001")
    assert(r.getAs[Long]("pid") == 123L)
    assert(r.getAs[String]("host") == "10.0.0.1")
    assert(r.getAs[Long]("port") == 9000L)
    assert(r.getAs[String]("query_text") == "SELECT count() FROM hits WHERE d > today()")
    assert(r.getAs[String]("stmt_type") == "select")
    assert(r.getAs[java.sql.Timestamp]("ts").toString == "2024-03-01 12:00:01.123456")
    assert(r.getAs[Boolean]("cv_ok"))
  }

  test("stats line: bytefmt + int casts; elapsed group discarded") {
    val Seq(r) = parse(stats)
    assert(r.getAs[String]("kind") == "stats")
    assert(r.getAs[Long]("rows_read") == 1000000L)
    assert(r.getAs[Long]("bytes_read") == (1.23 * 1024 * 1024 * 1024).toLong)
    assert(r.getAs[Long]("rps") == 2192982L)
    assert(r.getAs[Long]("speed") == (2.70 * 1024 * 1024 * 1024).toLong)
    assert(r.getAs[Boolean]("cv_ok"))
  }

  test("memory line: peak bytes + end timestamp") {
    val Seq(r) = parse(memory)
    assert(r.getAs[String]("kind") == "memory")
    assert(r.getAs[Long]("memory") == (1.05 * 1024 * 1024 * 1024).toLong)
    assert(r.getAs[Boolean]("cv_ok"))
  }

  test("error line: 16-bit code + message tail") {
    val Seq(r) = parse(error)
    assert(r.getAs[String]("kind") == "error")
    assert(r.getAs[Long]("error_code") == 60L)
    assert(r.getAs[String]("error_message") == "DB::Exception: Table default.missing does not exist.")
    assert(r.getAs[Boolean]("cv_ok"))
  }

  test("severity prefilter: Trace/Warning lines dropped before regexes") {
    assert(parse(
      "2024.03.01 12:00:01.123456 [ 1 ] {x} <Trace> executeQuery: (from 10.0.0.1:9000) SELECT 1",
      "some random line").isEmpty)
  }

  test("dashed date regex-matches but fails timestamp conversion (query.go:110-116)") {
    val Seq(r) = parse(initial.replace("2024.03.01", "2024-03-01"))
    assert(r.getAs[String]("kind") == "initial")
    assert(!r.getAs[Boolean]("cv_ok"))
  }

  test("fractional rps regex-matches but fails int conversion (query.go:171-176)") {
    val Seq(r) = parse(stats.replace("2192982 rows/sec.", "2192982.5 rows/sec."))
    assert(r.getAs[String]("kind") == "stats")
    assert(!r.getAs[Boolean]("cv_ok"))
  }

  test("error code out of int16 range fails conversion (ParseInt bitSize 16)") {
    val Seq(r) = parse(error.replace("Code: 60", "Code: 40000"))
    assert(!r.getAs[Boolean]("cv_ok"))
  }

  test("IPv6 initial lines never match (host group is IPv4-only)") {
    assert(parse(initial.replace("10.0.0.1", "::1")).isEmpty)
  }

  test("statement classifier mirrors sqlparser.Preview + getStmtType") {
    val cases = Seq(
      "SELECT 1" -> "select", "  select *" -> "select", "(SELECT 1)" -> "select",
      "INSERT INTO t VALUES (1)" -> "insert", "update t set x=1" -> "update",
      "DELETE FROM t" -> "delete", "SHOW TABLES" -> "other",
      "CREATE TABLE t (x Int32)" -> "other", "" -> "other")
    val df = cases.map(_._1).toDF("q")
      .select(col("q"), LogParser.stmtType(col("q")).as("t")).collect()
    df.zip(cases).foreach { case (r, (q, expected)) =>
      assert(r.getString(1) == expected, s"query: '$q'")
    }
  }

  test("classifier strips leading SQL comments like sqlparser.Preview") {
    val cases = Seq(
      "/* hint */ SELECT 1" -> "select",
      "/*a*/ /*b*/ INSERT INTO t VALUES (1)" -> "insert",
      "-- note\nDELETE FROM t" -> "delete",
      // StripLeadingComments never strips '#' (not a sqlparser comment form)
      "# mysql comment\nupdate t set x=1" -> "other",
      // a version comment '/*!' is KEPT -> Preview returns StmtComment -> other
      "/*! hint */ SELECT 1" -> "other",
      "/* multi\nline */ SELECT 1" -> "select",
      // '--' without a terminating newline is NOT stripped; '--select' then
      // classifies via non-letter stripping, exactly like the reference
      "--select 1" -> "select",
      "-- only a comment" -> "other",
      "/* unterminated SELECT" -> "other")
    val df = cases.map(_._1).toDF("q")
      .select(col("q"), LogParser.stmtType(col("q")).as("t")).collect()
    df.zip(cases).foreach { case (r, (q, expected)) =>
      assert(r.getString(1) == expected, s"query: '$q'")
    }
  }

  test("19-digit int64 values parse; true overflow is a convert failure") {
    // ParseInt(..., 10, 64) accepts up to Long.MaxValue = 9223372036854775807
    val Seq(ok) = parse(stats.replace("Read 1000000 rows", "Read 9223372036854775807 rows"))
    assert(ok.getAs[Long]("rows_read") == Long.MaxValue)
    assert(ok.getAs[Boolean]("cv_ok"))
    val Seq(over) = parse(stats.replace("Read 1000000 rows", "Read 9223372036854775808 rows"))
    assert(over.getAs[java.lang.Long]("rows_read") == null)
    assert(!over.getAs[Boolean]("cv_ok"))
  }
}
