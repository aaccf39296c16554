package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ClickHouseSql, MetricsJdbcUpsert}

/** GOLDEN statements for the ClickHouse-native append mapping: the exact
  * SQL a deployment sends is pinned here at the string level (no ClickHouse
  * runs in this sandbox — this is the executable check of the mapping that
  * used to live only in MetricsJdbcUpsert's scaladoc prose). */
class ClickHouseSqlSpec extends AnyFunSuite {

  test("golden: table DDL") {
    assert(ClickHouseSql.createTable("metrics") ==
      """CREATE TABLE IF NOT EXISTS metrics (
        |  metric LowCardinality(String),
        |  labels String,
        |  le String,
        |  value Int64,
        |  source LowCardinality(String),
        |  batch_id Int64
        |)
        |ENGINE = SummingMergeTree((value))
        |ORDER BY (metric, labels, le)
        |SETTINGS non_replicated_deduplication_window = 1000""".stripMargin)
  }

  test("DDL enables insert-block dedup on non-replicated tables") {
    // the replay-idempotence contract leans on insert-block deduplication,
    // which is OFF by default (window = 0) on a plain MergeTree — the DDL
    // itself must turn it on or replayed blocks double-count
    assert(ClickHouseSql.createTable("m")
      .contains("SETTINGS non_replicated_deduplication_window = 1000"))
  }

  test("golden: tagged delta insert, canonical row order, escaping") {
    val rows = Seq(
      ("clickhouse_query_time_bucket", "type=select", "5", 1L),
      ("chlogexporter_errors", "type=convert", "", 2L),
      // escaping: a label value carrying a quote and a backslash
      ("clickhouse_query_errors", """code=60,type=it's \ odd""", "", 1L))
    assert(ClickHouseSql.insert("metrics", "q0a1b2c3d4e5f67", 42L, rows) ==
      """INSERT INTO metrics (metric, labels, le, value, source, batch_id) VALUES
        |('chlogexporter_errors', 'type=convert', '', 2, 'q0a1b2c3d4e5f67', 42),
        |('clickhouse_query_errors', 'code=60,type=it\'s \\ odd', '', 1, 'q0a1b2c3d4e5f67', 42),
        |('clickhouse_query_time_bucket', 'type=select', '5', 1, 'q0a1b2c3d4e5f67', 42)""".stripMargin)
  }

  test("golden: empty batch still sends its presence marker") {
    assert(ClickHouseSql.insert("metrics", "qX", 7L, Nil) ==
      """INSERT INTO metrics (metric, labels, le, value, source, batch_id) VALUES
        |('__batch_marker', '', '', 0, 'qX', 7)""".stripMargin)
  }

  test("golden: read-side fold") {
    assert(ClickHouseSql.foldSelect("metrics") ==
      """SELECT metric, labels, le, sum(value) AS value
        |FROM metrics
        |WHERE metric <> '__batch_marker'
        |GROUP BY metric, labels, le
        |ORDER BY metric, labels, le""".stripMargin)
  }

  test("bootstrap = DDL + the 35-row zero grid tagged (seed, 0)") {
    val stmts = ClickHouseSql.bootstrap("metrics")
    assert(stmts.size == 2)
    assert(stmts.head == ClickHouseSql.createTable("metrics"))
    val grid = stmts(1)
    assert(grid.startsWith("INSERT INTO metrics"))
    // one VALUES tuple per static-grid row, all tagged (seed, 0), value 0
    val tuples = grid.linesIterator.count(_.startsWith("("))
    assert(tuples == MetricsJdbcUpsert.staticGrid.size)
    assert(grid.linesIterator.filter(_.startsWith("(")).forall(_.contains("0, 'seed', 0")))
  }

  test("a replayed batch renders a byte-identical block (the dedup unit)") {
    val rows = scala.util.Random.shuffle(Seq(
      ("a_metric", "k=v", "1", 3L), ("b_metric", "", "", 1L), ("a_metric", "k=w", "", 2L)))
    val first = ClickHouseSql.insert("m", "q1", 5L, rows)
    val replay = ClickHouseSql.insert("m", "q1", 5L, scala.util.Random.shuffle(rows))
    assert(first == replay, "canonical ordering must make replays byte-identical")
  }
}
