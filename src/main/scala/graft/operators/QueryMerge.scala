package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Known, documented divergence: after eviction the reference would accept a
  * brand-new initial line for the same id and start a second lifecycle; this
  * batch operator models one lifecycle per id (the streaming operator in
  * graft.streaming is fully sequential and handles re-use).
  *
  * Scale: everything is keyed by id — one shuffle for the window + joins on
  * the same key (Catalyst reuses the hash partitioning); per-key data is a
  * handful of rows, so no skew concern; aggregations are partial (map-side)
  * before the shuffle. No driver-side collection anywhere.
  */
object QueryMerge {

  /** First clean initial per id: the inserted state record.
    * Columns: id, init_seq, host, port, pid, query_text, stmt_type, start_time,
    * complete_seq (eviction point; Long.MaxValue while state never completes).
    */
  def firstInitials(parsed: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy("seq")
    val first = parsed
      .filter(col("kind") === "initial" && col("cv_ok"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("seq").as("init_seq"), col("host"), col("port"),
        col("pid"), col("query_text"), col("stmt_type"), col("ts").as("start_time"))

    // Eviction point: first clean memory line after the initial, non-insert only.
    val completeSeq = parsed
      .filter(col("kind") === "memory" && col("cv_ok"))
      .join(first.select(col("id"), col("init_seq"), col("stmt_type").as("base_stmt")), Seq("id"))
      .filter(col("seq") > col("init_seq") && col("base_stmt") =!= "insert")
      .groupBy("id").agg(min("seq").as("complete_seq"))

    first.join(completeSeq, Seq("id"), "left")
      .withColumn("complete_seq", coalesce(col("complete_seq"), lit(Long.MaxValue)))
  }

  /** All non-initial events classified against the state window.
    * Adds: init_seq, complete_seq, base_stmt_type, start_time, is_live.
    */
  def classified(parsed: DataFrame): DataFrame = {
    val base = firstInitials(parsed).select(
      col("id"), col("init_seq"), col("complete_seq"),
      col("stmt_type").as("base_stmt_type"), col("start_time"))
    parsed.filter(col("kind") =!= "initial")
      .join(base, Seq("id"), "left")
      .withColumn("is_live",
        col("init_seq").isNotNull && col("seq") > col("init_seq") &&
          col("seq") <= col("complete_seq"))
  }

  /** Live, convert-clean events of one kind (the lines that actually mutate
    * state and fire metric observations in the reference). */
  def liveEvents(parsed: DataFrame, kind: String): DataFrame =
    classified(parsed).filter(col("kind") === kind && col("is_live") && col("cv_ok"))

  /** The merged per-query table — the completed-record sink the reference
    * left as TODO (main.go:126). One row per inserted state record, Go
    * zero-values for fields whose line never arrived (FIXTURES.md §2 schema).
    */
  def merged(parsed: DataFrame): DataFrame = {
    val base = firstInitials(parsed)
    val cls = classified(parsed).filter(col("is_live") && col("cv_ok"))

    val lastStats = cls.filter(col("kind") === "stats").groupBy("id").agg(
      max_by(struct(col("rows_read"), col("bytes_read"), col("rps"), col("speed")), col("seq")).as("st"))
      .select(col("id"), col("st.rows_read").as("rows_read"), col("st.bytes_read").as("bytes_read"),
        col("st.rps").as("rps"), col("st.speed").as("speed"))

    // Non-insert ids have exactly one live memory line (the evicting one);
    // inserts keep updating, so last wins for both.
    val lastMem = cls.filter(col("kind") === "memory").groupBy("id").agg(
      max_by(struct(col("memory"), col("ts")), col("seq")).as("m"))
      .select(col("id"), col("m.memory").as("memory"), col("m.ts").as("end_time"))

    val lastErr = cls.filter(col("kind") === "error").groupBy("id").agg(
      max_by(struct(col("error_code"), col("error_message")), col("seq")).as("e"))
      .select(col("id"), col("e.error_code").as("error_code"), col("e.error_message").as("error_message"))

    base
      .join(lastStats, Seq("id"), "left")
      .join(lastMem, Seq("id"), "left")
      .join(lastErr, Seq("id"), "left")
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
  def errorCounters(parsed: DataFrame): DataFrame = {
    val base = firstInitials(parsed)
    val cls = classified(parsed)

    // duplicated_initial_query: initial line arriving while state exists
    val dups = parsed.filter(col("kind") === "initial")
      .join(base.select("id", "init_seq", "complete_seq"), Seq("id"))
      .filter(col("seq") > col("init_seq") && col("seq") <= col("complete_seq"))
      .agg(count("*").as("count"))
      .select(lit("duplicated_initial_query").as("type"), col("count"))

    // not_found_query: any non-initial event outside the state window
    val orphans = cls.filter(!col("is_live"))
      .agg(count("*").as("count"))
      .select(lit("not_found_query").as("type"), col("count"))

    // convert: clean-path failures — initial lines that never become state
    // and are not duplicates, plus malformed live events
    val convInit = parsed.filter(col("kind") === "initial" && !col("cv_ok"))
      .join(base.select("id", "init_seq", "complete_seq"), Seq("id"), "left")
      .filter(col("init_seq").isNull || col("seq") < col("init_seq") || col("seq") > col("complete_seq"))
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
