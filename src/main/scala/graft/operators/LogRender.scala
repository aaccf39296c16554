package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministically render the driver's `events` table into synthetic
  * ClickHouse server-log lines (the four formats of
  * /root/reference/query.go:15-18), so the whole log pipeline —
  * render → parse → keyed merge → prometheus aggregations — is checkable
  * against a DuckDB oracle that computes the same quantities directly from
  * the `events` columns.
  *
  * Every derived value uses integer arithmetic on `event_id`/`user_id` only
  * (no float formatting), so the oracle SQL in [[graft.LogOracle]] reproduces
  * it bit-exactly. The constants here and in LogOracle MUST stay in sync.
  *
  * Per event (id = "q-<event_id>"):
  *   - initial line  (seq +0)  unless orphan (event_id % 97 == 0)
  *   - duplicate initial (seq +1) when event_id % 101 == 0 (dup counter path)
  *   - stats line    (seq +2)  always
  *   - error line    (seq +3)  when event_id % 10 == 7
  *   - memory line   (seq +4)  always
  *
  * Orphan events exercise the reference's `not_found_query` path
  * (query.go:190,237,270); duplicates the `duplicated_initial_query` path
  * (query.go:92-94); inserts (stmt pick 1) the never-evicted-state leak
  * (query.go:230-233).
  */
object LogRender {

  val OrphanMod = 97
  val DupMod = 101
  val ErrMod = 10
  val ErrRem = 7

  /** In noisy mode, initial lines of every NoiseMod-th event carry a dashed
    * date: the regex matches but `time.Parse` with the dots-only layout
    * fails (query.go:110-116) → the convert-error path, with the event's
    * other lines becoming orphans. */
  val NoiseMod = 89
  val DtFormatDashed = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** stmt pick: event_id % 5 -> query text / statement type. */
  val StmtTexts: Seq[(String, String)] = Seq(
    "SELECT count() FROM hits WHERE d > today()" -> "select",
    "INSERT INTO hits VALUES (1, 2, 3)" -> "insert",
    "UPDATE hits SET x = 1 WHERE y = 2" -> "update",
    "DELETE FROM hits WHERE x = 1" -> "delete",
    "SHOW TABLES FROM default" -> "other")

  // Multiplier/modulus pairs chosen so the derived values span the
  // reference's histogram bucket ranges at sf0.01+ (event_id up to ~1e5).
  val ElapsedUsMul = 7919123L
  val ElapsedUsMod = 1900000000L // < 1900 s, spans the query_time buckets
  val RowsMul = 2000003L
  val RowsMod = 20000000000L // spans rows_read buckets (up to 1e10)
  val GibMul = 13L
  val GibMod = 2048L // bytes read, GiB units: spans 5..1000 GiB buckets
  val RpsMul = 100003L
  val RpsMod = 2000000000L // spans rows/sec buckets
  val MibPsMul = 11L
  val MibPsMod = 65536L // speed, MiB/sec units: spans 100MiB..50GiB buckets
  val MemMibMul = 7L
  val MemMibMod = 131072L // peak memory, MiB units

  val DtFormat = "yyyy.MM.dd HH:mm:ss.SSSSSS"

  /** @return (seq: long, value: string) log lines, ~3.2 per event. */
  def lines(events: DataFrame, noisy: Boolean = false): DataFrame = {
    val eid = col("event_id")
    val noise = if (noisy) eid % NoiseMod === 0 else lit(false)
    val orphan = eid % OrphanMod === 0
    val dup = eid % DupMod === 0
    val hasErr = eid % ErrMod === ErrRem
    val s = eid % 5

    val id = concat(lit("q-"), eid.cast("string"))
    val pid = (lit(100) + eid % 900).cast("string")
    val host = concat(lit("10.0.0."), (col("user_id") % 256).cast("string"))
    val port = (lit(9000) + eid % 100).cast("string")
    val queryText = StmtTexts.zipWithIndex.foldRight(lit(""): Column) {
      case (((text, _), i), acc) => when(s === i, text).otherwise(acc)
    }
    val elapsedUs = (eid * ElapsedUsMul) % ElapsedUsMod
    val startTs = col("ts")
    val endTs = timestamp_micros(unix_micros(startTs) + elapsedUs)
    val dtStart = date_format(startTs, DtFormat)
    val dtEnd = date_format(endTs, DtFormat)
    val rows = ((eid * RowsMul) % RowsMod).cast("string")
    val gib = ((eid * GibMul) % GibMod).cast("string")
    val rps = ((eid * RpsMul) % RpsMod).cast("string")
    val mibps = ((eid * MibPsMul) % MibPsMod).cast("string")
    val memmib = ((eid * MemMibMul) % MemMibMod).cast("string")
    val errCode = (lit(1) + eid % 999).cast("string")

    val head = (dt: Column) => concat(dt, lit(" [ "), pid, lit(" ] {"), id, lit("} "))
    val dtInit = when(noise, date_format(startTs, DtFormatDashed)).otherwise(dtStart)
    val initLine = concat(head(dtInit), lit("<Debug> executeQuery: (from "),
      host, lit(":"), port, lit(", user: default) "), queryText)
    val statsLine = concat(head(dtStart), lit("<Information> executeQuery: Read "),
      rows, lit(" rows, "), gib, lit(" GiB in 0.500 sec., "),
      rps, lit(" rows/sec., "), mibps, lit(" MiB/sec."))
    val errLine = concat(head(dtStart), lit("<Error> executeQuery: Code: "),
      errCode, lit(", e.displayText() = DB::Exception: synthetic error "), eid.cast("string"))
    val memLine = concat(head(dtEnd),
      lit("<Debug> MemoryTracker: Peak memory usage (for query): "), memmib, lit(" MiB."))

    val part = (off: Int, line: Column, cond: Column) =>
      when(cond, struct(lit(off.toLong).as("off"), line.as("line")))

    events
      .select(eid.as("event_id"),
        filter(array(
          part(0, initLine, !orphan),
          part(1, initLine, !orphan && dup),
          part(2, statsLine, lit(true)),
          part(3, errLine, hasErr),
          part(4, memLine, lit(true))), p => p.isNotNull).as("parts"))
      .select(col("event_id"), explode(col("parts")).as("p"))
      .select((col("event_id") * 8 + col("p.off")).as("seq"), col("p.line").as("value"))
  }
}
