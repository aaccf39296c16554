package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermarked streaming twin of the batch ordered-funnel analytics
  * ([[graft.RelationalQueries.eventsFunnel]]): per-user
  * `flatMapGroupsWithState` — the next-most-stateful events analytic after
  * sessionization, and the custom-state machinery `session_window` can't
  * express (the funnel fold is ORDER-dependent across event types, not a
  * gap merge).
  *
  * Correctness model: the batch fold consumes a user's funnel events sorted
  * by `(ts, event_type)`, and its result is tie-order-independent (strict
  * `>` step conditions — see the batch scaladoc). Here events BUFFER in
  * group state until the watermark passes them, then fold into the funnel
  * accumulator in `(ts, event_type)` order: each finalized segment's
  * timestamps all follow every previously-finalized event (strict `<`
  * watermark cut, monotone watermark), so the segmented fold replays the
  * batch fold exactly. One final row per user emits when the user has been
  * inactive past `horizonMs` (event-time timeout) — StreamingFunnelSpec
  * proves the emission stream ≡ the oracle-checked batch answer across a
  * checkpointed kill/restart under both state-store providers.
  *
  * 100 TB shape: state per ACTIVE user = the 3-slot accumulator plus only
  * the events inside the lateness window (`delay`) — the buffer drains to
  * the accumulator every trigger, so memory scales with concurrently-active
  * users × in-flight lateness horizon, never with history. Keyed and
  * shuffled by user_id only. Late events beyond `delay` are dropped by the
  * watermark — the same trade the sessionization twin documents.
  */
object StreamingFunnel {

  /** Funnel event in group state: epoch-micros + event type. */
  final case class FEvent(tsUs: Long, et: String)

  /** Group state: not-yet-finalized buffer (ts ≥ last watermark), the
    * 3-step accumulator over the finalized prefix (−1 = unset — 0 is a
    * legitimate epoch-0 timestamp, the sentinel-collision class
    * RetentionPropertySpec caught; None doesn't fit a stable encoder as
    * cleanly), and the max event time seen (drives the inactivity timeout). */
  final case class FState(buf: List[FEvent], t1: Long, t2: Long, t3: Long, maxTsUs: Long)

  /** Emitted once per user at funnel close. */
  final case class FOut(user_id: Long, t_view: Option[java.sql.Timestamp],
      t_click: Option[java.sql.Timestamp], t_purchase: Option[java.sql.Timestamp],
      steps: Long)

  private def toUs(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def toTs(us: Long): Option[java.sql.Timestamp] =
    if (us < 0L) None
    else Some(java.sql.Timestamp.from(
      Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)))

  /** One batch-fold step — the EXACT transition of the batch `aggregate()`
    * lambda: every condition reads the PRE-update accumulator (a view can't
    * enable a same-event click), steps gate on strict `ts >`. */
  private[graft] def step(t1: Long, t2: Long, t3: Long, e: FEvent): (Long, Long, Long) = (
    if (t1 < 0L && e.et == "view") e.tsUs else t1,
    if (t2 < 0L && e.et == "click" && t1 >= 0L && e.tsUs > t1) e.tsUs else t2,
    if (t3 < 0L && e.et == "purchase" && t2 >= 0L && e.tsUs > t2) e.tsUs else t3)

  private[graft] def foldSorted(st: FState, evs: Seq[FEvent]): FState = {
    var (a, b, c) = (st.t1, st.t2, st.t3)
    evs.sortBy(e => (e.tsUs, e.et)).foreach { e =>
      val n = step(a, b, c, e); a = n._1; b = n._2; c = n._3
    }
    st.copy(t1 = a, t2 = b, t3 = c)
  }

  private def out(user: Long, st: FState): FOut = {
    val fin = foldSorted(st, st.buf) // timeout ⇒ watermark passed everything
    FOut(user, toTs(fin.t1), toTs(fin.t2), toTs(fin.t3),
      if (fin.t3 >= 0L) 3L else if (fin.t2 >= 0L) 2L else if (fin.t1 >= 0L) 1L else 0L)
  }

  private def update(horizonMs: Long)(user: Long,
      rows: Iterator[(Long, java.sql.Timestamp, String)],
      state: GroupState[FState]): Iterator[FOut] = {
    if (state.hasTimedOut) {
      val done = out(user, state.get)
      state.remove()
      Iterator.single(done)
    } else {
      val st = state.getOption.getOrElse(FState(Nil, -1L, -1L, -1L, 0L))
      val incoming = rows.map { case (_, ts, et) => FEvent(toUs(ts), et) }.toList
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // finalize everything the watermark has passed: these timestamps all
      // follow every previously-finalized event (strict cut, monotone wm),
      // so folding them sorted extends the batch fold's prefix
      val (fin, keep) = (st.buf ++ incoming).partition(_.tsUs < wmUs)
      val maxTs = (st.maxTsUs :: incoming.map(_.tsUs)).max
      state.update(foldSorted(st, fin).copy(buf = keep, maxTsUs = maxTs))
      state.setTimeoutTimestamp(maxTs / 1000L + horizonMs)
      Iterator.empty
    }
  }

  /** Final funnel rows of a streaming `(user_id, ts, event_type)` frame:
    * a user's funnel closes after `horizonMs` of event-time inactivity
    * (default 30 days — any horizon longer than the corpus span yields
    * exactly the batch answer); `delay` is the watermark lateness
    * tolerance. Append mode: one row per closed funnel, emitted once. */
  def funnel(events: DataFrame, delay: String = "30 minutes",
      horizonMs: Long = 30L * 24 * 3600 * 1000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // casts BEFORE the watermark: projecting a cast of the watermarked
    // column afterwards creates a new attribute without the event-time tag
    // and the EventTimeTimeout checker rejects the plan
    val typed: Dataset[(Long, java.sql.Timestamp, String)] = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_type").cast("string").as("event_type"))
      .withWatermark("ts", delay)
      .as[(Long, java.sql.Timestamp, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(horizonMs))
      .toDF()
  }
}
