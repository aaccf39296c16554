package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{ChQuery, LogEvent}

/** Structured-Streaming re-expression of the reference's keyed stateful
  * merge (J1-J5, /root/reference/query.go:91-274 + main.go:110-129): events
  * shuffle to their query-id's state partition; the state function replays
  * the reference's per-line transition sequentially (events sorted by `seq`
  * within each micro-batch), so all arrival-order semantics — duplicate
  * initials keep the first record, orphans drop, the first memory line of a
  * non-insert query completes AND evicts, later same-id lines are orphans,
  * a post-eviction initial starts a fresh lifecycle — hold exactly.
  *
  * Deliberate, documented improvement over the reference: a processing-time
  * state timeout evicts never-completing queries (inserts, error-only,
  * abandoned), fixing the unbounded `map[string]*chQuery` growth the
  * reference leaks (query.go:230-233 never marks inserts FullInfo; no other
  * eviction exists). On timeout the partial record is emitted with
  * `fullInfo = false` so no data is lost.
  *
  * Scale: state is hash-partitioned by id across executors (RocksDB state
  * store in production — checkpoint recovery is spec-verified under
  * `RocksDBStateStoreProvider`, the store that holds at 100x where the
  * HDFS-backed in-memory default falls over), one in-flight record per id;
  * per-batch per-key work is O(lines of that query). Checkpointing gives
  * exactly-once the reference never had. Eviction timeouts come in both
  * flavors: wall-clock (`ProcessingTimeTimeout`, default) and
  * watermark-driven (`eventTimeTimeout = true` — deterministic on replay).
  */
object StreamingMerge {

  /** Rename the [[graft.operators.LogParser]] output columns to
    * [[LogEvent]] encoder names. */
  def toLogEvents(parsed: DataFrame): Dataset[LogEvent] = {
    import parsed.sparkSession.implicits._
    parsed.select(
      col("seq"), col("kind"), col("id"), col("pid"), col("ts"),
      col("host"), col("port"),
      col("query_text").as("queryText"), col("stmt_type").as("stmtType"),
      col("rows_read").as("rowsRead"), col("bytes_read").as("bytesRead"),
      col("rps"), col("speed"), col("memory"),
      col("error_code").as("errorCode"), col("error_message").as("errorMessage"),
      col("cv_ok").as("cvOk")).as[LogEvent]
  }

  private def insertRecord(e: LogEvent): ChQuery =
    ChQuery(
      id = e.id,
      host = e.host.getOrElse(""),
      port = e.port.getOrElse(0L),
      pid = e.pid.getOrElse(0L),
      query = e.queryText.getOrElse(""),
      startTime = e.ts,
      stmtType = e.stmtType.getOrElse("other"))

  /** One emission of the streaming merge: a completed/flushed record, an
    * error-counter increment (the A2 observe sites, query.go:93,152,190,212,
    * 237,257,270), or a metric OBSERVATION at the reference's exact observe
    * sites — `insert` (A3, query.go:127), `query_error` (A4, query.go:262),
    * `time_obs` (A5, query.go:228 — fires for inserts too), `stats_obs`
    * (A6-A9, query.go:183-186). The observation stream is what makes the
    * metric surface INCREMENTAL: a registry folds these per batch instead of
    * re-aggregating the corpus. */
  final case class MergeOut(
      out: String, // "record" | "counter" | "insert" | "query_error" | "time_obs" | "stats_obs" | "read_line" | "tail_line"
      record: Option[ChQuery],
      counterType: Option[String],
      stmtType: Option[String] = None,
      errorCode: Option[Long] = None,
      elapsedUs: Option[Long] = None,
      rowsRead: Option[Long] = None,
      bytesRead: Option[Long] = None,
      rps: Option[Long] = None,
      speed: Option[Long] = None,
      // multiplicity: "read_line"/"tail_line" arrive PRE-AGGREGATED (one
      // event per source partition per batch, n = lines counted) since the
      // single-scan delivery fold; every other kind stays n = 1
      n: Long = 1L,
      // fleet deployments: which server's log produced this emission
      // (None on the single-file path — label-free, reference-identical)
      server: Option[String] = None)

  /** One micro-batch worth of events for a single query id, replayed in
    * arrival order against the state record. Emits completed records AND
    * counter increments at exactly the reference's observe sites.
    * Package-visible for direct testing via `TestGroupState`. */
  private[graft] def transitionFull(events: Iterator[LogEvent], state: GroupState[ChQuery],
      timeoutMs: Long, eventTimeTimeout: Boolean = false): Iterator[MergeOut] = {
    val out = scala.collection.mutable.ListBuffer.empty[MergeOut]
    def counter(t: String): Unit = out += MergeOut("counter", None, Some(t))
    var cur: Option[ChQuery] = state.getOption
    var maxTsMs = Long.MinValue
    events.toSeq.sortBy(_.seq).foreach { e =>
      e.ts.foreach(t => maxTsMs = math.max(maxTsMs, t.getTime))
      e.kind match {
        // pre-aggregated per-partition delivery counts (synthetic
        // CountIdPrefix-keyed events from the single-scan fold) — stateless
        // passthrough into the metric stream
        case "read_count" =>
          out += MergeOut("read_line", None, None, n = e.rowsRead.getOrElse(0L))
        case "tail_count" =>
          out += MergeOut("tail_line", None, None, n = e.rowsRead.getOrElse(0L))
        case "initial" =>
          if (cur.isDefined) counter("duplicated_initial_query") // first kept
          else if (e.cvOk) {
            cur = Some(insertRecord(e))
            // A3 observe site (query.go:127): one increment per state insert
            out += MergeOut("insert", None, None, stmtType = Some(cur.get.stmtType))
          } else counter("convert")
        case "stats" | "error" | "memory" if cur.isEmpty =>
          counter("not_found_query") // state miss precedes conversion
        case _ if !e.cvOk =>
          counter("convert")
        case "stats" =>
          cur = cur.map(_.copy(
            rowsRead = e.rowsRead.getOrElse(0L), bytesRead = e.bytesRead.getOrElse(0L),
            rps = e.rps.getOrElse(0L), speed = e.speed.getOrElse(0L)))
          // A6-A9 observe site (query.go:183-186): every live clean stats line
          out += MergeOut("stats_obs", None, None,
            rowsRead = e.rowsRead, bytesRead = e.bytesRead, rps = e.rps, speed = e.speed)
        case "error" =>
          cur = cur.map(_.copy(error = true,
            errorCode = e.errorCode.getOrElse(0L),
            errorMessage = e.errorMessage.getOrElse("")))
          // A4 observe site (query.go:262)
          out += MergeOut("query_error", None, None,
            stmtType = cur.map(_.stmtType), errorCode = e.errorCode)
        case "memory" =>
          val endTs = e.ts
          def micros(t: Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
          val elapsedUs = (for (s <- cur.get.startTime; t <- endTs)
            yield micros(t) - micros(s)).getOrElse(0L)
          val updated = cur.get.copy(
            memory = e.memory.getOrElse(0L), endTime = endTs,
            elapsed = elapsedUs / 1000000.0)
          // A5 observe site (query.go:228): fires for inserts too, BEFORE the
          // FullInfo check
          out += MergeOut("time_obs", None, None,
            stmtType = Some(updated.stmtType), elapsedUs = Some(elapsedUs))
          if (updated.stmtType != "insert") {
            // J5: completion + eviction — later lines for this id are orphans
            out += MergeOut("record", Some(updated.copy(fullInfo = true)), None)
            cur = None
          } else cur = Some(updated)
        case _ => ()
      }
    }
    cur match {
      case Some(rec) =>
        state.update(rec)
        if (timeoutMs > 0) {
          if (eventTimeTimeout) {
            // watermark-driven eviction: the record expires `timeoutMs` of
            // EVENT time after its last line (fall back to the watermark
            // itself when the batch carried no timestamps — late stats-only
            // batches — so the deadline always sits above the watermark)
            val base = math.max(maxTsMs, state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(base + timeoutMs)
          } else state.setTimeoutDuration(timeoutMs)
        }
      case None => if (state.exists) state.remove()
    }
    out.iterator
  }

  /** [[mergeWithMetrics]] plus per-line DELIVERY accounting in the same
    * output stream: `MergeOut("read_line", n = …)` per delivered-line
    * count, `MergeOut("tail_line", n = …)` per delivery-failure count
    * (the S3 side channel). Every counter the serving layer needs rides
    * ONE stream, so a `foreachBatch` sink commits delivery counts and
    * merge metrics under the SAME batch — exactly-once together — where
    * the former `observe()` + StreamingQueryListener side channel was
    * at-most-once.
    *
    * SINGLE SCAN: the source range is read exactly once per micro-batch.
    * [[graft.operators.LogParser.parseKeepAll]] keeps non-matching and
    * delivery-failed lines as kind-null rows, [[deliveredEvents]] counts
    * them map-side (per partition, BEFORE the shuffle — kind-null rows
    * never shuffle) and appends one synthetic `read_count`/`tail_count`
    * event per partition, which the state function passes through as the
    * pre-aggregated `n`-valued delivery emissions. The former shape was a
    * two-branch union that re-read the tail range per branch. */
  def mergeWithDelivery(seqLines: DataFrame,
      timeoutMs: Long = 30 * 60 * 1000L): Dataset[MergeOut] = {
    val delivered = graft.sources.LogSource.withDelivery(seqLines)
    val parsedAll = graft.operators.LogParser.parseKeepAll(delivered)
    mergeWithMetrics(deliveredEvents(parsedAll, fleet = false), timeoutMs)
  }

  /** Id prefix (U+0001 sentinel) of the synthetic per-partition
    * delivery-count events. Even a pathological real query id of the same
    * shape is harmless: it would only share a state key with events that
    * neither read nor write state (the count case in transitionFull is a
    * stateless passthrough), so both lifecycles proceed unaffected. */
  private val CountIdPrefix = "\u0001c:"

  /** Typed events from a [[graft.operators.LogParser.parseKeepAll]] frame,
    * with per-partition delivery counts folded in-band: passes real events
    * through lazily, counts delivered/failed lines map-side, and emits one
    * trailing `read_count`/`tail_count` synthetic event per partition
    * (per server on the fleet path — `fleet = true` expects a `src`
    * column, namespaces every id `src + FleetSep + id`, and keys the count
    * events per (partition, src)). */
  private[graft] def deliveredEvents(parsedAll: DataFrame, fleet: Boolean): Dataset[LogEvent] = {
    import parsedAll.sparkSession.implicits._
    val srcCol = if (fleet) col("src") else lit("")
    val idCol =
      if (fleet) concat_ws(FleetSep, col("src"), col("id"))
      else col("id")
    val sel = parsedAll.select(
      struct(
        col("seq"), col("kind"), idCol.as("id"), col("pid"), col("ts"),
        col("host"), col("port"),
        col("query_text").as("queryText"), col("stmt_type").as("stmtType"),
        col("rows_read").as("rowsRead"), col("bytes_read").as("bytesRead"),
        col("rps"), col("speed"), col("memory"),
        col("error_code").as("errorCode"), col("error_message").as("errorMessage"),
        col("cv_ok").as("cvOk")).as("_1"),
      col("tail_ok").as("_2"),
      srcCol.as("_3")).as[(LogEvent, Boolean, String)]
    sel.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Array[Long]]
      val main = it.flatMap { case (ev, ok, src) =>
        val c = counts.getOrElseUpdate(src, Array(0L, 0L))
        if (!ok) { c(1) += 1; None }
        else { c(0) += 1; if (ev.kind == null) None else Some(ev) }
      }
      def countEvent(kind: String, tag: String, src: String, cnt: Long): LogEvent = {
        val marker = CountIdPrefix + tag + ":" + pid
        LogEvent(0L, kind,
          if (fleet) src + FleetSep + marker else marker,
          None, None, None, None, None, None, Some(cnt), None, None, None,
          None, None, None, cvOk = true)
      }
      def trailer: Iterator[LogEvent] = counts.iterator.flatMap { case (src, c) =>
        (if (c(0) > 0) Seq(countEvent("read_count", "r", src, c(0))) else Nil) ++
          (if (c(1) > 0) Seq(countEvent("tail_count", "t", src, c(1))) else Nil)
      }
      main ++ trailer
    }
  }

  /** Record-only view of [[transitionFull]] (compat + simple pipelines). */
  private[graft] def transition(events: Iterator[LogEvent], state: GroupState[ChQuery],
      timeoutMs: Long): Iterator[ChQuery] =
    transitionFull(events, state, timeoutMs).flatMap(_.record)

  /** The full streaming merge: completed records (plus timeout-flushed
    * partials) AND error-counter increments, in append mode. Downstream:
    * `.filter(_.out == "record")` for the record sink,
    * `.filter(_.out == "counter").groupBy("counterType").count()` (or a
    * foreachBatch accumulation) for the `chlogexporter_errors` surface. */
  def mergeWithMetrics(events: Dataset[LogEvent],
      timeoutMs: Long = 30 * 60 * 1000L,
      eventTimeTimeout: Boolean = false,
      watermarkDelay: String = "10 minutes"): Dataset[MergeOut] = {
    import events.sparkSession.implicits._
    // timeoutMs <= 0 disables the leak-fix eviction timer — required when a
    // downstream stateful operator (e.g. a watermarked window agg) runs in
    // the same AvailableNow job, where armed processing-time timeouts keep
    // scheduling batches and the trigger never drains.
    // eventTimeTimeout = the J5 watermark-driven alternative (SURVEY §2.4):
    // stuck records expire `timeoutMs` of EVENT time after their last line,
    // once the watermark (bounded by `watermarkDelay` of lateness) passes
    // the deadline — deterministic on replay, unlike wall-clock timeouts,
    // and it drains fine under AvailableNow (fires only on watermark
    // movement, which needs data).
    val timeoutConf =
      if (timeoutMs <= 0) GroupStateTimeout.NoTimeout
      else if (eventTimeTimeout) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    val src =
      if (timeoutMs > 0 && eventTimeTimeout) events.withWatermark("ts", watermarkDelay)
      else events
    src
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (_: String, es: Iterator[LogEvent], state: GroupState[ChQuery]) =>
          if (state.hasTimedOut) {
            // leak fix: flush the stuck record (insert/error-only/abandoned)
            val rec = state.get
            state.remove()
            Iterator.single(MergeOut("record", Some(rec), None))
          } else transitionFull(es, state, timeoutMs, eventTimeTimeout)
      }
  }

  /** Record-only streaming merge. */
  def merge(events: Dataset[LogEvent], timeoutMs: Long = 30 * 60 * 1000L): Dataset[ChQuery] = {
    import events.sparkSession.implicits._
    mergeWithMetrics(events, timeoutMs).flatMap(_.record)
  }

  /** Watermarked event-time windowed aggregation over the completed-record
    * stream: per-minute query counts by statement type, late data bounded
    * by the watermark (SURVEY §2.7 — the windowed-agg surface the reference
    * approximates with its wall-clock counters). Append mode: a window
    * finalizes once the watermark passes its end. */
  def windowedQueryCounts(records: Dataset[ChQuery],
      watermark: String = "10 minutes", windowLen: String = "1 minute"): DataFrame = {
    records
      .withColumn("start_ts", col("startTime"))
      .withWatermark("start_ts", watermark)
      .groupBy(window(col("start_ts"), windowLen), col("stmtType"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("stmtType").as("stmt_type"), col("cnt"))
  }

  /** Arrival-order `seq` for a streaming line Dataset: `batchId` (20 bits)
    * | partition id (20 bits) | line index within the partition (24 bits).
    * Text-source partitions preserve file order, so same-file lines (the
    * only ones whose relative order the correlation depends on) keep their
    * arrival order; the 20-bit partition field holds a million partitions
    * per batch (the old 8-bit packing collided past 256 partitions).
    * (`monotonically_increasing_id` is not allowed in streaming plans.) */
  def seqAssign(lines: Dataset[String], batchId: Long = 0L): DataFrame = {
    import lines.sparkSession.implicits._
    lines.mapPartitions { it =>
      val base = (batchId << 44) |
        (org.apache.spark.TaskContext.getPartitionId().toLong << 24)
      it.zipWithIndex.map { case (v, i) => (base | i.toLong, v) }
    }.toDF("seq", "value")
  }

  /** Full streaming pipeline from a directory of log files (the rotation
    * story: each rotated file is a new file in the directory — a better fit
    * than the reference's tail-and-reopen). Cross-batch seq reuse is fine
    * here: the state function orders events within one micro-batch only. */
  def filePipeline(spark: org.apache.spark.sql.SparkSession, dir: String,
      timeoutMs: Long = 30 * 60 * 1000L): Dataset[ChQuery] = {
    import spark.implicits._
    val lines = seqAssign(spark.readStream.text(dir).as[String])
    merge(toLogEvents(graft.operators.LogParser.parse(lines)), timeoutMs)
  }

  /** The reference's primary mode end-to-end: tail-follow ONE appending log
    * file ([[graft.sources.TailFileSourceProvider]], seek-to-EOF default /
    * `fromStart` = `--from-start`) → parse → keyed merge — the exact
    * main.go:100-129 loop, with `seq` = line start byte offset. */
  def tailPipeline(spark: org.apache.spark.sql.SparkSession, path: String,
      fromStart: Boolean = false, timeoutMs: Long = 30 * 60 * 1000L,
      maxBytesPerTrigger: Long = 0L): Dataset[ChQuery] = {
    val lines = spark.readStream
      .format(classOf[graft.sources.TailFileSourceProvider].getName)
      .option("path", path)
      .option("fromStart", fromStart.toString)
      .option("maxBytesPerTrigger", maxBytesPerTrigger.toString)
      .load()
    merge(toLogEvents(graft.operators.LogParser.parse(lines)), timeoutMs)
  }

  /** Server-id separator inside the fleet merge's composite state key:
    * U+0000 cannot appear in a ClickHouse query id. */
  private val FleetSep = "\u0000"

  /** The CLUSTER deployment of the reference's loop: tail a FLEET of server
    * logs ([[graft.sources.TailFleetSourceProvider]], one per ClickHouse
    * server) through ONE keyed merge. Query ids are only unique per server,
    * so the merge keys state on the composite `(src, id)` — two servers
    * reusing the same id stay independent lifecycles — and completed
    * records come back with a `server` column (the source path) alongside
    * the original id.
    *
    * Scale shape: one cheap single-partition scan per progressing file,
    * then the shuffle into the id-partitioned `flatMapGroupsWithState` is
    * where parallelism happens — state spreads over
    * `spark.sql.shuffle.partitions` regardless of fleet size, and adding
    * servers adds scan tasks, never widens any single tail. */
  def fleetPipeline(spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      fromStart: Boolean = false, timeoutMs: Long = 30 * 60 * 1000L,
      maxBytesPerTrigger: Long = 0L): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat_ws, substring_index}
    val lines = spark.readStream
      .format(classOf[graft.sources.TailFleetSourceProvider].getName)
      .option("paths", paths.mkString(","))
      .option("fromStart", fromStart.toString)
      .option("maxBytesPerTrigger", maxBytesPerTrigger.toString)
      .load()
    // `src` passes through the parser untouched, then folds into the state
    // key; the merge itself is byte-for-byte the single-file one
    val parsed = graft.operators.LogParser.parse(lines)
      .withColumn("id", concat_ws(FleetSep, col("src"), col("id")))
      .drop("src")
    merge(toLogEvents(parsed), timeoutMs).toDF()
      .withColumn("server", substring_index(col("id"), FleetSep, 1))
      .withColumn("id", substring_index(col("id"), FleetSep, -1))
  }

  /** [[mergeWithDelivery]] over a FLEET line frame (`src, seq, value` from
    * [[graft.sources.TailFleetSourceProvider]]): the same single-scan
    * delivery fold and keyed merge, with state keyed on the composite
    * `(src, id)` (query ids are only unique per server) and EVERY emission
    * tagged `server = src` — completed records, error counters, metric
    * observations, and the per-partition delivery counts alike. This is
    * what gives the fleet exporter per-server metric series
    * ([[FleetPromRegistry]]) and per-server JDBC label rows off one merge. */
  def fleetMergeWithDelivery(fleetLines: DataFrame,
      timeoutMs: Long = 30 * 60 * 1000L): Dataset[MergeOut] = {
    import fleetLines.sparkSession.implicits._
    val delivered = graft.sources.LogSource.withDelivery(fleetLines)
    val parsedAll = graft.operators.LogParser.parseKeepAll(delivered)
    val events = deliveredEvents(parsedAll, fleet = true)
    val timeoutConf =
      if (timeoutMs <= 0) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    events
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: String, es: Iterator[LogEvent], state: GroupState[ChQuery]) =>
          val sep = key.indexOf(FleetSep)
          val server = if (sep >= 0) key.substring(0, sep) else ""
          val base =
            if (state.hasTimedOut) {
              val rec = state.get
              state.remove()
              Iterator.single(MergeOut("record", Some(rec), None))
            } else transitionFull(es, state, timeoutMs)
          // un-namespace the record id; the server rides its own field
          base.map(o => o.copy(server = Some(server),
            record = o.record.map(r =>
              if (sep >= 0) r.copy(id = r.id.substring(sep + 1)) else r)))
      }
  }
}
