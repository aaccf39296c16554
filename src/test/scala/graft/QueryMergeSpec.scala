package graft

import graft.operators.{LogParser, PromMetrics, QueryMerge}

/** State-machine semantics of the batch keyed merge (J1-J5), on a crafted
  * corpus exercising every edge the reference handles:
  * dup initials, orphans, insert non-eviction, post-eviction orphans.
  */
class QueryMergeSpec extends SparkSpec {
  import spark.implicits._

  private def line(seq: Long, id: String, kind: String, extra: String = ""): (Long, String) = {
    val dt = "2024.03.01 12:00:01.000000"
    val dtEnd = "2024.03.01 12:00:03.500000"
    kind match {
      case "initial" =>
        (seq, s"$dt [ 7 ] {$id} <Debug> executeQuery: (from 10.0.0.9:9000, user: default) ${if (extra.isEmpty) "SELECT 1" else extra}")
      case "stats" =>
        (seq, s"$dt [ 7 ] {$id} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec.")
      case "memory" =>
        (seq, s"$dtEnd [ 7 ] {$id} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB.")
      case "error" =>
        (seq, s"$dt [ 7 ] {$id} <Error> executeQuery: Code: 60, e.displayText() = DB::Exception: boom")
    }
  }

  private val corpus = Seq(
    // q1: full select lifecycle with an error line
    line(0, "q1", "initial"),
    line(1, "q1", "stats"),
    line(2, "q1", "error"),
    line(3, "q1", "memory"),
    // q1 line AFTER completion: the reference evicted on the memory line,
    // so this is an orphan (not_found_query), not a state update
    line(4, "q1", "stats"),
    // q2: insert — memory line does NOT complete it (query.go:230-233)
    line(10, "q2", "initial", "INSERT INTO t VALUES (1)"),
    line(11, "q2", "stats"),
    line(12, "q2", "memory"),
    // q3: orphan events with no initial at all
    line(20, "q3", "stats"),
    line(21, "q3", "memory"),
    // q4: duplicate initial — first kept, second counted
    line(30, "q4", "initial"),
    line(31, "q4", "initial", "DELETE FROM t"),
    line(32, "q4", "memory"))

  private lazy val parsed = LogParser.parse(corpus.toDF("seq", "value"))
  private lazy val merged = QueryMerge.merged(parsed).collect()
    .map(r => r.getAs[String]("id") -> r).toMap

  test("full lifecycle merges all four event kinds; elapsed from timestamps") {
    val r = merged("q1")
    assert(r.getAs[Long]("rows_read") == 500L)
    assert(r.getAs[Long]("bytes_read") == 2048L)
    assert(r.getAs[Long]("memory") == 3L * 1024 * 1024)
    assert(r.getAs[Boolean]("full_info"))
    assert(r.getAs[Boolean]("error"))
    assert(r.getAs[Long]("error_code") == 60L)
    assert(r.getAs[Double]("elapsed") == 2.5)
    assert(r.getAs[String]("stmt_type") == "select")
  }

  test("insert memory line records memory/end but never marks full_info") {
    val r = merged("q2")
    assert(r.getAs[Long]("memory") == 3L * 1024 * 1024)
    assert(!r.getAs[Boolean]("full_info"))
  }

  test("orphan ids produce no merged record") {
    assert(!merged.contains("q3"))
  }

  test("duplicate initial keeps the first record") {
    val r = merged("q4")
    assert(r.getAs[String]("stmt_type") == "select") // not the DELETE
    assert(r.getAs[Boolean]("full_info"))
  }

  test("error counters: dup, orphans incl. post-eviction line") {
    val counters = QueryMerge.errorCounters(parsed).collect()
      .map(r => r.getAs[String]("type") -> r.getAs[Long]("count")).toMap
    assert(counters("duplicated_initial_query") == 1L)
    // q1 post-eviction stats + q3 stats + q3 memory
    assert(counters("not_found_query") == 3L)
    assert(!counters.contains("convert"))
  }

  test("query_count counts one insert per state record by type") {
    val counts = PromMetrics.queryCount(parsed).collect()
      .map(r => r.getAs[String]("stmt_type") -> r.getAs[Long]("count")).toMap
    assert(counts == Map("select" -> 2L, "insert" -> 1L))
  }

  // post-eviction id re-use: the reference deletes state on FullInfo
  // (main.go:125-129) and re-inserts on the next initial (query.go:91)
  private val reuseCorpus = Seq(
    line(0, "r1", "initial"),
    line(1, "r1", "stats"),
    line(2, "r1", "memory"), // evicts lifecycle 1
    line(3, "r1", "initial", "SELECT 2"), // lifecycle 2 — NOT a duplicate
    line(4, "r1", "error"),
    line(5, "r1", "memory"), // evicts lifecycle 2
    line(6, "r1", "stats")) // orphan after lifecycle 2

  test("re-used id: one merged record per lifecycle, both complete") {
    val p = LogParser.parse(reuseCorpus.toDF("seq", "value"))
    val recs = QueryMerge.merged(p).collect().sortBy(_.getAs[java.sql.Timestamp]("end_time"))
    assert(recs.length == 2, s"expected 2 lifecycles, got ${recs.length}")
    assert(recs.forall(_.getAs[String]("id") == "r1"))
    assert(recs.forall(_.getAs[Boolean]("full_info")))
    assert(recs(0).getAs[Long]("rows_read") == 500L) // stats in lifecycle 1 only
    assert(recs(1).getAs[Long]("rows_read") == 0L)
    assert(recs(1).getAs[Boolean]("error") && recs(1).getAs[Long]("error_code") == 60L)
    assert(!recs(0).getAs[Boolean]("error"))
  }

  test("re-used id: second initial inserts (query_count 2), no duplicate counted, trailing orphan counted") {
    val p = LogParser.parse(reuseCorpus.toDF("seq", "value"))
    val counts = PromMetrics.queryCount(p).collect()
      .map(r => r.getAs[String]("stmt_type") -> r.getAs[Long]("count")).toMap
    assert(counts == Map("select" -> 2L))
    val counters = QueryMerge.errorCounters(p).collect()
      .map(r => r.getAs[String]("type") -> r.getAs[Long]("count")).toMap
    assert(counters == Map("not_found_query" -> 1L), counters.toString)
  }

  test("insert lifecycles never evict: a later initial for the same id stays a duplicate") {
    val corpus = Seq(
      line(0, "i1", "initial", "INSERT INTO t VALUES (1)"),
      line(1, "i1", "memory"), // updates, does not evict (insert)
      line(2, "i1", "initial"), // duplicate — state still exists
      line(3, "i1", "memory"))
    val p = LogParser.parse(corpus.toDF("seq", "value"))
    assert(QueryMerge.merged(p).count() == 1)
    val counters = QueryMerge.errorCounters(p).collect()
      .map(r => r.getAs[String]("type") -> r.getAs[Long]("count")).toMap
    assert(counters == Map("duplicated_initial_query" -> 1L))
  }

  test("prometheus histogram: cumulative buckets, zero-fill, +Inf") {
    val hist = PromMetrics.queryTimeHistogram(parsed).collect()
      .filter(_.getAs[String]("stmt_type") == "select")
      .map(r => r.getAs[Double]("le") -> r.getAs[Long]("cum_count")).toMap
    // q1 (2.5s) and q4 (2.5s) both land in the 5s bucket
    assert(hist(1.0) == 0L)
    assert(hist(5.0) == 2L)
    assert(hist(1800.0) == 2L)
    assert(hist(Double.PositiveInfinity) == 2L)
    assert(hist.size == PromMetrics.QueryTimeBuckets.size + 1)
  }
}
