package graft

import graft.operators.{LogRender, PromMetrics}

/** DuckDB oracle SQL for the log-pipeline queries.
  *
  * [[graft.operators.LogRender]] derives every log-line value from
  * `events.event_id`/`user_id`/`ts` with integer arithmetic only, so the
  * oracle can compute the expected pipeline outputs directly from the
  * `events` table — if the Spark render → regex parse → keyed merge →
  * aggregation path is correct, the results hash-match bit-for-bit.
  * All constants are interpolated from LogRender/PromMetrics so the two
  * sides cannot drift.
  */
object LogOracle {
  import LogRender._

  private def stmtCase(col: String): String =
    s"CASE event_id % 5 " + StmtTexts.zipWithIndex.map { case ((text, tpe), i) =>
      val v = if (col == "query") text else tpe
      s"WHEN $i THEN '$v'"
    }.mkString(" ") + " END"

  /** Shared CTE: per-event derived values, mirroring LogRender.lines. */
  val E: String =
    s"""e AS (
       |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
       |    (event_id % $OrphanMod = 0) AS orphan,
       |    (event_id % $DupMod = 0) AS dup,
       |    (event_id % $ErrMod = $ErrRem) AS haserr,
       |    event_id % 5 AS s,
       |    (event_id * $ElapsedUsMul) % $ElapsedUsMod AS elapsed_us,
       |    (event_id * $RowsMul) % $RowsMod AS rows_read,
       |    ((event_id * $GibMul) % $GibMod) * 1073741824 AS bytes_read,
       |    (event_id * $RpsMul) % $RpsMod AS rps,
       |    ((event_id * $MibPsMul) % $MibPsMod) * 1048576 AS speed,
       |    ((event_id * $MemMibMul) % $MemMibMod) * 1048576 AS memory,
       |    CAST(1 + event_id % 999 AS BIGINT) AS error_code,
       |    CAST(100 + event_id % 900 AS BIGINT) AS pid,
       |    'q-' || CAST(event_id AS VARCHAR) AS id
       |  FROM events)""".stripMargin

  private def bucketsValues(buckets: Seq[Double]): String =
    (buckets.map(b => s"(CAST(${BigDecimal(b).toBigInt} AS DOUBLE))") :+
      "(CAST('infinity' AS DOUBLE))").mkString(", ")

  /** Cumulative prometheus histogram, no labels: (le, cum_count). */
  private def histSql(obsSelect: String, buckets: Seq[Double]): String =
    s"""WITH $E, obs AS ($obsSelect),
       |buckets(le) AS (VALUES ${bucketsValues(buckets)})
       |SELECT b.le AS le, CAST(count(o.v) AS BIGINT) AS cum_count
       |FROM buckets b LEFT JOIN obs o ON o.v <= b.le
       |GROUP BY b.le ORDER BY b.le""".stripMargin

  /** Cumulative prometheus histogram with stmt_type label. */
  private def histByTypeSql(obsSelect: String, buckets: Seq[Double]): String =
    s"""WITH $E, obs AS ($obsSelect),
       |buckets(le) AS (VALUES ${bucketsValues(buckets)}),
       |labels AS (SELECT DISTINCT stmt_type FROM obs)
       |SELECT l.stmt_type AS stmt_type, b.le AS le, CAST(count(o.v) AS BIGINT) AS cum_count
       |FROM labels l CROSS JOIN buckets b
       |LEFT JOIN obs o ON o.stmt_type = l.stmt_type AND o.v <= b.le
       |GROUP BY l.stmt_type, b.le ORDER BY l.stmt_type, b.le""".stripMargin

  val readLines: String =
    s"""WITH $E
       |SELECT CAST(sum((CASE WHEN orphan THEN 0 WHEN dup THEN 2 ELSE 1 END)
       |  + 1 + (CASE WHEN haserr THEN 1 ELSE 0 END) + 1) AS BIGINT) AS n FROM e""".stripMargin

  val parsedEvents: String = {
    val nulls = "CAST(NULL AS BIGINT) AS rows_read, CAST(NULL AS BIGINT) AS bytes_read, " +
      "CAST(NULL AS BIGINT) AS rps, CAST(NULL AS BIGINT) AS speed, " +
      "CAST(NULL AS BIGINT) AS memory, CAST(NULL AS BIGINT) AS error_code"
    s"""WITH $E, k AS (
       |  SELECT event_id*8 AS seq, 'initial' AS kind, id, pid, $nulls FROM e WHERE NOT orphan
       |  UNION ALL
       |  SELECT event_id*8+1, 'initial', id, pid, NULL, NULL, NULL, NULL, NULL, NULL FROM e WHERE NOT orphan AND dup
       |  UNION ALL
       |  SELECT event_id*8+2, 'stats', id, pid, rows_read, bytes_read, rps, speed, NULL, NULL FROM e
       |  UNION ALL
       |  SELECT event_id*8+3, 'error', id, pid, NULL, NULL, NULL, NULL, NULL, error_code FROM e WHERE haserr
       |  UNION ALL
       |  SELECT event_id*8+4, 'memory', id, pid, NULL, NULL, NULL, NULL, memory, NULL FROM e)
       |SELECT * FROM k ORDER BY seq""".stripMargin
  }

  /** [[graft.operators.Pii.scrub]] over the rendered clean corpus: rebuild
    * every line TEXT from `events` (the render is integer-exact and the
    * session timezone is UTC on both engines, so the strings — timestamps
    * included — match byte-for-byte), then replay the count + sequential
    * redaction with the identical RE2-safe patterns. */
  val piiScrub: String = {
    import graft.operators.Pii
    def head(dt: String) =
      s"$dt || ' [ ' || CAST(pid AS VARCHAR) || ' ] {' || id || '} '"
    val dtStart = "strftime(ts, '%Y.%m.%d %H:%M:%S.%f')"
    val dtEnd = "strftime(ts + to_microseconds(elapsed_us), '%Y.%m.%d %H:%M:%S.%f')"
    val init = head(dtStart) +
      " || '<Debug> executeQuery: (from 10.0.0.' || CAST(user_id % 256 AS VARCHAR)" +
      " || ':' || CAST(9000 + event_id % 100 AS VARCHAR) || ', user: default) ' || " +
      stmtCase("query")
    val stats = head(dtStart) +
      " || '<Information> executeQuery: Read ' || CAST(rows_read AS VARCHAR)" +
      s" || ' rows, ' || CAST((event_id * $GibMul) % $GibMod AS VARCHAR)" +
      " || ' GiB in 0.500 sec., ' || CAST(rps AS VARCHAR)" +
      s" || ' rows/sec., ' || CAST((event_id * $MibPsMul) % $MibPsMod AS VARCHAR)" +
      " || ' MiB/sec.'"
    val err = head(dtStart) +
      " || '<Error> executeQuery: Code: ' || CAST(error_code AS VARCHAR)" +
      " || ', e.displayText() = DB::Exception: synthetic error ' || CAST(event_id AS VARCHAR)"
    val mem = head(dtEnd) +
      " || '<Debug> MemoryTracker: Peak memory usage (for query): '" +
      s" || CAST((event_id * $MemMibMul) % $MemMibMod AS VARCHAR) || ' MiB.'"
    s"""WITH $E, lines AS (
       |  SELECT event_id*8 AS seq, $init AS value FROM e WHERE NOT orphan
       |  UNION ALL
       |  SELECT event_id*8+1, $init FROM e WHERE NOT orphan AND dup
       |  UNION ALL
       |  SELECT event_id*8+2, $stats FROM e
       |  UNION ALL
       |  SELECT event_id*8+3, $err FROM e WHERE haserr
       |  UNION ALL
       |  SELECT event_id*8+4, $mem FROM e)
       |SELECT seq,
       |  CAST(len(regexp_extract_all(value, '${Pii.EmailRe}')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(value, '${Pii.Ipv4Re}')) AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(value, '${Pii.LongNumRe}')) AS BIGINT) AS n_num,
       |  regexp_replace(regexp_replace(regexp_replace(value,
       |    '${Pii.EmailRe}', '${Pii.EmailTag}', 'g'),
       |    '${Pii.Ipv4Re}', '${Pii.IpTag}', 'g'),
       |    '${Pii.LongNumRe}', '${Pii.NumTag}', 'g') AS redacted
       |FROM lines ORDER BY seq""".stripMargin
  }

  val merged: String =
    s"""WITH $E
       |SELECT id,
       |  '10.0.0.' || CAST(user_id % 256 AS VARCHAR) AS host,
       |  CAST(9000 + event_id % 100 AS BIGINT) AS port,
       |  pid,
       |  ${stmtCase("query")} AS query,
       |  ts AS start_time,
       |  ts + to_microseconds(elapsed_us) AS end_time,
       |  rows_read, bytes_read,
       |  CAST(elapsed_us AS DOUBLE) / 1000000.0 AS elapsed,
       |  rps, speed, memory,
       |  (s <> 1) AS full_info,
       |  haserr AS error,
       |  CAST(CASE WHEN haserr THEN 1 + event_id % 999 ELSE 0 END AS BIGINT) AS error_code,
       |  CASE WHEN haserr THEN 'DB::Exception: synthetic error ' || CAST(event_id AS VARCHAR) ELSE '' END AS error_message,
       |  ${stmtCase("type")} AS stmt_type,
       |  CAST(0.0 AS DOUBLE) AS tcp_processed
       |FROM e WHERE NOT orphan ORDER BY id""".stripMargin

  /** Fleet twin of [[merged]]: events 2k and 2k+1 land on srv0/srv1 with
    * the COLLIDING plain id `q-k`; per-server state isolation means each
    * event still produces exactly its own record — so the expected table
    * is [[merged]]'s per-event rows with the rewritten id plus a `server`
    * column. (A merge WITHOUT the per-server namespacing would see dup
    * initials and cross-contaminated stats here — that is the semantics
    * this oracle pins.) */
  val mergedFleet: String =
    s"""WITH $E
       |SELECT 'srv' || CAST(event_id % 2 AS VARCHAR) AS server,
       |  'q-' || CAST(event_id // 2 AS VARCHAR) AS id,
       |  '10.0.0.' || CAST(user_id % 256 AS VARCHAR) AS host,
       |  CAST(9000 + event_id % 100 AS BIGINT) AS port,
       |  pid,
       |  ${stmtCase("query")} AS query,
       |  ts AS start_time,
       |  ts + to_microseconds(elapsed_us) AS end_time,
       |  rows_read, bytes_read,
       |  CAST(elapsed_us AS DOUBLE) / 1000000.0 AS elapsed,
       |  rps, speed, memory,
       |  (s <> 1) AS full_info,
       |  haserr AS error,
       |  CAST(CASE WHEN haserr THEN 1 + event_id % 999 ELSE 0 END AS BIGINT) AS error_code,
       |  CASE WHEN haserr THEN 'DB::Exception: synthetic error ' || CAST(event_id AS VARCHAR) ELSE '' END AS error_message,
       |  ${stmtCase("type")} AS stmt_type,
       |  CAST(0.0 AS DOUBLE) AS tcp_processed
       |FROM e WHERE NOT orphan ORDER BY server, id""".stripMargin

  val queryCount: String =
    s"""WITH $E
       |SELECT ${stmtCase("type")} AS stmt_type, count(*) AS cnt
       |FROM e WHERE NOT orphan GROUP BY 1 ORDER BY 1""".stripMargin

  val queryErrors: String =
    s"""WITH $E
       |SELECT ${stmtCase("type")} AS stmt_type, error_code, count(*) AS cnt
       |FROM e WHERE NOT orphan AND haserr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Counters over the noisy corpus: dashed-date initials exercise the
    * `convert` path; their other lines become `not_found` orphans. */
  val convertCounters: String =
    s"""WITH $E, f AS (SELECT *, (event_id % $NoiseMod = 0) AS noisy FROM e), c AS (
       |  SELECT 'convert' AS type, CAST(sum(CASE WHEN noisy AND NOT orphan
       |    THEN 1 + (CASE WHEN dup THEN 1 ELSE 0 END) ELSE 0 END) AS BIGINT) AS cnt FROM f
       |  UNION ALL
       |  SELECT 'duplicated_initial_query', count(*) FILTER (dup AND NOT orphan AND NOT noisy) FROM f
       |  UNION ALL
       |  SELECT 'not_found_query', CAST(sum(CASE WHEN orphan OR noisy
       |    THEN 2 + (CASE WHEN haserr THEN 1 ELSE 0 END) ELSE 0 END) AS BIGINT) FROM f)
       |SELECT type, cnt FROM c WHERE cnt > 0 ORDER BY type""".stripMargin

  val errorCounters: String =
    s"""WITH $E, c AS (
       |  SELECT 'duplicated_initial_query' AS type, count(*) AS cnt FROM e WHERE dup AND NOT orphan
       |  UNION ALL
       |  SELECT 'not_found_query', CAST(sum(CASE WHEN haserr THEN 3 ELSE 2 END) AS BIGINT) FROM e WHERE orphan)
       |SELECT type, cnt FROM c WHERE cnt > 0 ORDER BY type""".stripMargin

  val queryTimeHist: String = histByTypeSql(
    s"SELECT ${stmtCase("type")} AS stmt_type, CAST(elapsed_us AS DOUBLE)/1000000.0 AS v FROM e WHERE NOT orphan",
    PromMetrics.QueryTimeBuckets)

  val queryTimeSum: String =
    s"""WITH $E
       |SELECT ${stmtCase("type")} AS stmt_type,
       |  CAST(sum(elapsed_us) AS BIGINT) AS sum_elapsed_us, count(*) AS cnt
       |FROM e WHERE NOT orphan GROUP BY 1 ORDER BY 1""".stripMargin

  private val statsObs = "SELECT %s AS v FROM e WHERE NOT orphan"
  val rowsReadHist: String = histSql(statsObs.format("rows_read"), PromMetrics.RowsReadBuckets)
  val bytesReadHist: String = histSql(statsObs.format("bytes_read"), PromMetrics.BytesReadBuckets)
  val rpsHist: String = histSql(statsObs.format("rps"), PromMetrics.RpsBuckets)
  val bpsHist: String = histSql(statsObs.format("speed"), PromMetrics.BpsBuckets)

  val statsSums: String =
    s"""WITH $E
       |SELECT CAST(sum(rows_read) AS BIGINT) AS rows_read_sum,
       |  CAST(sum(bytes_read) AS BIGINT) AS bytes_read_sum,
       |  CAST(sum(rps) AS BIGINT) AS rps_sum,
       |  CAST(sum(speed) AS BIGINT) AS speed_sum,
       |  count(*) AS cnt
       |FROM e WHERE NOT orphan""".stripMargin

  /** The FULL registry as one tall `(metric, labels, le, value)` table —
    * the oracle for `MetricsSink.metricsTable`, composed by wrapping every
    * per-metric oracle above in the tall shape. One hash-checked query
    * covers the entire metric surface at once. */
  val metricsTable: String = {
    def arm(sql: String, metric: String, labels: String, le: String, value: String): String =
      s"SELECT '$metric' AS metric, $labels AS labels, CAST($le AS DOUBLE) AS le, " +
        s"CAST($value AS DOUBLE) AS value FROM ($sql) q"
    def statArms(name: String, histSql: String, sumCol: String): Seq[String] = Seq(
      arm(histSql, s"${name}_bucket", "''", "le", "cum_count"),
      arm(statsSums, s"${name}_sum", "''", "NULL", sumCol),
      arm(statsSums, s"${name}_count", "''", "NULL", "cnt"))
    (Seq(
      arm(readLines, "chlogexporter_read_lines", "''", "NULL", "n"),
      arm(errorCounters, "chlogexporter_errors", "'type=' || type", "NULL", "cnt"),
      arm(queryCount, "clickhouse_query_count", "'type=' || stmt_type", "NULL", "cnt"),
      arm(queryErrors, "clickhouse_query_errors",
        "'code=' || CAST(error_code AS VARCHAR) || ',type=' || stmt_type", "NULL", "cnt"),
      arm(queryTimeHist, "clickhouse_query_time_bucket", "'type=' || stmt_type", "le", "cum_count"),
      arm(queryTimeSum, "clickhouse_query_time_sum", "'type=' || stmt_type", "NULL",
        "CAST(sum_elapsed_us AS DOUBLE) * 1e-6"),
      arm(queryTimeSum, "clickhouse_query_time_count", "'type=' || stmt_type", "NULL", "cnt")) ++
      statArms("clickhouse_select_query_rows_read", rowsReadHist, "rows_read_sum") ++
      statArms("clickhouse_select_query_bytes_read", bytesReadHist, "bytes_read_sum") ++
      statArms("clickhouse_select_query_rows_per_second", rpsHist, "rps_sum") ++
      statArms("clickhouse_select_query_bytes_per_second", bpsHist, "speed_sum"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY metric, labels, le NULLS FIRST")
  }
}
