package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch re-expression of the reference's keyed stateful merge
  * (/root/reference/query.go:91-274, main.go:110-129): correlate the four
  * event kinds on query id with arrival-order semantics reconstructed from
  * the per-line `seq` column.
  *
  * State-machine semantics reproduced relationally:
  *   - J1 insert: the FIRST convert-clean initial line per id wins; later
  *     initial lines while state exists count `duplicated_initial_query`
  *     (query.go:92-94).
  *   - J2/J3/J4 update: stats/memory/error lines are "live" only in the state
  *     window (after the first initial, up to and including the completing
  *     memory line); last live line of each kind wins, matching
  *     update-in-place.
  *   - J5 eviction: for non-insert queries the first live memory line marks
  *     FullInfo and evicts (query.go:230-233, main.go:125-129); any later
  *     event for that id is an orphan (`not_found_query`), exactly as a
  *     post-eviction lookup misses in the reference. Inserts never evict.
  *   - Orphans: events before the initial line or with no initial at all
  *     (query.go:190,237,270). Conversion is attempted only on live events
  *     (the reference checks state before converting), so a malformed orphan
  *     counts `not_found_query`, not `convert`.
  *
  * Re-used ids are handled exactly as the reference does (main.go:125-129
  * delete → query.go:91 re-insert): after eviction, the next clean initial
  * line starts a SECOND lifecycle for the same id. Lifecycle windows are
  * computed relationally by a per-id fold (`aggregate` HOF) over that id's
  * sorted clean-initial/clean-memory sequence — the alternation (open on
  * initial-while-closed, close on memory-while-open-non-insert) is a
  * genuinely sequential recurrence, but each id has only a handful of such
  * lines, so the fold runs over a tiny per-key array after one keyed
  * aggregation.
  *
  * Scale: everything is keyed by id — one shuffle for the lifecycle fold +
  * joins on the same key (Catalyst reuses the hash partitioning); per-key
  * data is a handful of rows, so no skew concern; aggregations are partial
  * (map-side) before the shuffle. No driver-side collection anywhere.
  */
object QueryMerge {

  /** Per-id lifecycle-window fold: over the seq-sorted array of clean
    * initial/memory markers, a clean initial opens a window while none is
    * open (later initials inside a window are duplicates, query.go:92-94); a
    * clean memory line closes a non-insert window (J5 eviction,
    * query.go:230-233); insert windows never close (Long.MaxValue). */
  private val LifecycleFold: String =
    """aggregate(
      |  evs,
      |  named_struct(
      |    'ws', cast(array() as array<struct<s:bigint,e:bigint>>),
      |    'open', cast(null as bigint), 'oins', false),
      |  (acc, x) -> CASE
      |    WHEN x.is_init AND acc.open IS NULL THEN
      |      named_struct('ws', acc.ws, 'open', x.seq, 'oins', x.is_insert)
      |    WHEN NOT x.is_init AND acc.open IS NOT NULL AND NOT acc.oins THEN
      |      named_struct(
      |        'ws', array_append(acc.ws, named_struct('s', acc.open, 'e', x.seq)),
      |        'open', cast(null as bigint), 'oins', false)
      |    ELSE acc END,
      |  acc -> CASE WHEN acc.open IS NOT NULL THEN
      |      array_append(acc.ws, named_struct('s', acc.open,
      |        'e', cast(9223372036854775807 as bigint)))
      |    ELSE acc.ws END)""".stripMargin

  /** One row per inserted state record (= lifecycle window; a re-used id
    * yields one row per lifecycle, numbered from 1 in seq order).
    * Columns: id, lifecycle, init_seq, host, port, pid, query_text,
    * stmt_type, start_time, complete_seq (eviction point; Long.MaxValue
    * while state never completes).
    */
  def stateInserts(parsed: DataFrame): DataFrame = {
    val cand = parsed
      .filter(col("cv_ok") && (col("kind") === "initial" || col("kind") === "memory"))
      .select(col("id"), struct(col("seq"),
        (col("kind") === "initial").as("is_init"),
        coalesce(col("stmt_type") === "insert", lit(false)).as("is_insert")).as("ev"))
    val windows = cand.groupBy("id").agg(sort_array(collect_list(col("ev"))).as("evs"))
      .select(col("id"), posexplode(expr(LifecycleFold)).as(Seq("pos", "w")))
      .select(col("id"), (col("pos") + 1).cast("int").as("lifecycle"),
        col("w.s").as("init_seq"), col("w.e").as("complete_seq"))

    windows.join(
      parsed.filter(col("kind") === "initial" && col("cv_ok"))
        .select(col("id"), col("seq").as("init_seq"), col("host"), col("port"),
          col("pid"), col("query_text"), col("stmt_type"), col("ts").as("start_time")),
      Seq("id", "init_seq"))
      .select(col("id"), col("lifecycle"), col("init_seq"), col("host"),
        col("port"), col("pid"), col("query_text"), col("stmt_type"),
        col("start_time"), col("complete_seq"))
  }

  /** All non-initial events classified against their enclosing lifecycle
    * window (windows of one id are disjoint, so the range join matches at
    * most once). Adds: lifecycle, init_seq, complete_seq, base_stmt_type,
    * start_time, is_live.
    */
  def classified(parsed: DataFrame): DataFrame = {
    val base = stateInserts(parsed).select(
      col("id").as("b_id"), col("lifecycle"), col("init_seq"), col("complete_seq"),
      col("stmt_type").as("base_stmt_type"), col("start_time"))
    parsed.filter(col("kind") =!= "initial")
      .join(base, col("id") === col("b_id") &&
        col("seq") > col("init_seq") && col("seq") <= col("complete_seq"), "left")
      .drop("b_id")
      .withColumn("is_live", col("init_seq").isNotNull)
  }

  /** Live, convert-clean events of one kind (the lines that actually mutate
    * state and fire metric observations in the reference). */
  def liveEvents(parsed: DataFrame, kind: String): DataFrame =
    classified(parsed).filter(col("kind") === kind && col("is_live") && col("cv_ok"))

  /** The merged per-query table — the completed-record sink the reference
    * left as TODO (main.go:126). One row per inserted state record (so one
    * per lifecycle for a re-used id), Go zero-values for fields whose line
    * never arrived (FIXTURES.md §2 schema).
    */
  def merged(parsed: DataFrame): DataFrame = {
    val base = stateInserts(parsed)
    val cls = classified(parsed).filter(col("is_live") && col("cv_ok"))
    val key = Seq("id", "lifecycle")

    val lastStats = cls.filter(col("kind") === "stats").groupBy(key.map(col): _*).agg(
      max_by(struct(col("rows_read"), col("bytes_read"), col("rps"), col("speed")), col("seq")).as("st"))
      .select(col("id"), col("lifecycle"),
        col("st.rows_read").as("rows_read"), col("st.bytes_read").as("bytes_read"),
        col("st.rps").as("rps"), col("st.speed").as("speed"))

    // Non-insert lifecycles have exactly one live memory line (the evicting
    // one); inserts keep updating, so last wins for both.
    val lastMem = cls.filter(col("kind") === "memory").groupBy(key.map(col): _*).agg(
      max_by(struct(col("memory"), col("ts")), col("seq")).as("m"))
      .select(col("id"), col("lifecycle"), col("m.memory").as("memory"), col("m.ts").as("end_time"))

    val lastErr = cls.filter(col("kind") === "error").groupBy(key.map(col): _*).agg(
      max_by(struct(col("error_code"), col("error_message")), col("seq")).as("e"))
      .select(col("id"), col("lifecycle"),
        col("e.error_code").as("error_code"), col("e.error_message").as("error_message"))

    base
      .join(lastStats, key, "left")
      .join(lastMem, key, "left")
      .join(lastErr, key, "left")
      .select(
        col("id"),
        col("host"),
        col("port"),
        col("pid"),
        col("query_text").as("query"),
        col("start_time"),
        col("end_time"),
        coalesce(col("rows_read"), lit(0L)).as("rows_read"),
        coalesce(col("bytes_read"), lit(0L)).as("bytes_read"),
        when(col("end_time").isNotNull,
          (unix_micros(col("end_time")) - unix_micros(col("start_time"))).cast("double") / lit(1000000.0))
          .otherwise(lit(0.0)).as("elapsed"),
        coalesce(col("rps"), lit(0L)).as("rps"),
        coalesce(col("speed"), lit(0L)).as("speed"),
        coalesce(col("memory"), lit(0L)).as("memory"),
        (col("end_time").isNotNull && col("stmt_type") =!= "insert").as("full_info"),
        col("error_code").isNotNull.as("error"),
        coalesce(col("error_code"), lit(0L)).as("error_code"),
        coalesce(col("error_message"), lit("")).as("error_message"),
        col("stmt_type"),
        lit(0.0).as("tcp_processed"))
  }

  /** The `chlogexporter_errors{type}` counter table (metrics.go:8-14).
    * Only observed (count > 0) label values are emitted, matching Prometheus
    * counter-vec semantics (a counter exists once incremented).
    */
  /** Initial lines range-joined against the lifecycle windows of their id:
    * a match means the line arrived while state existed (duplicate). */
  private def initialsAgainstWindows(parsed: DataFrame): DataFrame = {
    val wins = stateInserts(parsed)
      .select(col("id").as("b_id"), col("init_seq"), col("complete_seq"))
    parsed.filter(col("kind") === "initial")
      .join(wins, col("id") === col("b_id") &&
        col("seq") > col("init_seq") && col("seq") <= col("complete_seq"), "left")
  }

  def errorCounters(parsed: DataFrame): DataFrame = {
    val cls = classified(parsed)
    val initials = initialsAgainstWindows(parsed)

    // duplicated_initial_query: initial line arriving while state exists
    val dups = initials.filter(col("init_seq").isNotNull)
      .agg(count("*").as("count"))
      .select(lit("duplicated_initial_query").as("type"), col("count"))

    // not_found_query: any non-initial event outside every state window
    val orphans = cls.filter(!col("is_live"))
      .agg(count("*").as("count"))
      .select(lit("not_found_query").as("type"), col("count"))

    // convert: clean-path failures — initial lines that never become state
    // and are not duplicates, plus malformed live events
    val convInit = initials.filter(col("init_seq").isNull && !col("cv_ok"))
      .agg(count("*").as("count"))
      .select(lit("convert").as("type"), col("count"))
    val convLive = cls.filter(col("is_live") && !col("cv_ok"))
      .agg(count("*").as("count"))
      .select(lit("convert").as("type"), col("count"))

    dups.unionAll(orphans).unionAll(convInit).unionAll(convLive)
      .groupBy("type").agg(sum("count").as("count"))
      .filter(col("count") > 0)
  }

  /** [[errorCounters]] plus the `tail_line` label (S3, main.go:113-117),
    * fed by the delivery side channel of
    * [[graft.sources.LogSource.withDelivery]] — with it, all four reference
    * label values {tail_line, duplicated_initial_query, convert,
    * not_found_query} exist in the counter-vec. Distributed count, no
    * driver-side collection. */
  def errorCountersWithTail(parsed: DataFrame, linesWithDelivery: DataFrame): DataFrame = {
    val tail = linesWithDelivery.filter(!col("tail_ok"))
      .agg(count("*").as("count"))
      .select(lit("tail_line").as("type"), col("count"))
    errorCounters(parsed).unionAll(tail.filter(col("count") > 0))
  }
}
