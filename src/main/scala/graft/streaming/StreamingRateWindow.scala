package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermarked streaming twin of the batch trailing-hour rate window
  * ([[graft.RelationalQueries.eventsRateWindow]]): per event, the same
  * user's event count and cents-sum over `[ts − 1h, ts]` (inclusive, the
  * batch RANGE frame) — emitted exactly once per event, as soon as the
  * event's frame is COMPLETE.
  *
  * Completeness model: an event `e` finalizes when the watermark passes
  * its timestamp — every frame member has `ts' ≤ e.ts < wm`, and the
  * watermark contract says nothing with `ts' < wm` can still arrive — so
  * the frame computed from the buffer at that moment is the batch frame.
  * The emission frontier (the watermark through which events have been
  * emitted) makes the emission exactly-once; the buffer prunes to
  * `ts ≥ wm − 1h`, because only those rows can sit in a future event's
  * frame (already-emitted rows stay until they age out of reach — a row
  * is a frame MEMBER for an hour after it is itself emitted).
  *
  * 100 TB shape: keyed and shuffled by user_id only; state per active
  * user = the events inside `lateness + 1h` of the frontier — the same
  * activity-horizon bound the batch window's per-user frame assumes.
  * State removes on event-time timeout after `horizonMs` of inactivity
  * (safe: a longer gap than the horizon means no frame can span it,
  * since horizon ≫ 1h). Late events beyond `delay` are dropped by the
  * watermark — the package's documented trade. */
object StreamingRateWindow {

  /** Buffered event: id, epoch-micros, integer cents. */
  final case class REvent(eventId: Long, tsUs: Long, cents: Long)

  final case class RWState(buf: List[REvent], frontierUs: Long, maxTsUs: Long)

  final case class RWOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      n_last_hour: Long, value_last_hour: Double)

  private val HourUs = 3600L * 1000000L

  private def toUs(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def toTs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  /** The PURE state transition (property-tested directly by
    * RateWindowPropertySpec): absorb `incoming` (all with `ts ≥` the
    * previous watermark, per the lateness contract), emit every buffered
    * event in `[frontier, wm)` with its trailing-hour stats over the whole
    * buffer (members may already be emitted rows), prune the buffer to
    * rows a future event (`ts ≥ wm`) can still frame, and advance the
    * frontier. `wm = Long.MaxValue` flushes everything (the timeout path). */
  private[graft] def advance(user: Long, st: RWState, incoming: List[REvent],
      wmUs: Long): (List[RWOut], RWState) = {
    val buf = st.buf ++ incoming
    val ready = buf.filter(e => e.tsUs >= st.frontierUs && e.tsUs < wmUs)
    val outs = ready.sortBy(e => (e.tsUs, e.eventId)).map { e =>
      val frame = buf.filter(m => m.tsUs >= e.tsUs - HourUs && m.tsUs <= e.tsUs)
      RWOut(e.eventId, user, toTs(e.tsUs),
        frame.size.toLong, frame.map(_.cents).sum.toDouble / 100.0)
    }
    val maxTs = (st.maxTsUs :: incoming.map(_.tsUs)).max
    (outs, RWState(
      buf.filter(e => wmUs == Long.MaxValue || e.tsUs >= wmUs - HourUs),
      math.max(st.frontierUs, wmUs), maxTs))
  }

  private def update(horizonMs: Long)(user: Long,
      rows: Iterator[(Long, Long, java.sql.Timestamp, Long)],
      state: GroupState[RWState]): Iterator[RWOut] = {
    if (state.hasTimedOut) {
      // watermark is past every buffered event: flush the tail, drop state
      val (outs, _) = advance(user, state.get, Nil, Long.MaxValue)
      state.remove()
      outs.iterator
    } else {
      // Long.MinValue sentinels, like the funnel/retention twins' -1: a 0L
      // frontier would silently never emit pre-1970 (negative epoch-µs)
      // events, and a 0L maxTs would skew their first timeout deadline
      val st = state.getOption.getOrElse(RWState(Nil, Long.MinValue, Long.MinValue))
      val incoming = rows.map { case (_, id, ts, c) => REvent(id, toUs(ts), c) }.toList
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (outs, next) = advance(user, st, incoming, wmUs)
      state.update(next)
      state.setTimeoutTimestamp(next.maxTsUs / 1000L + horizonMs)
      outs.iterator
    }
  }

  /** Exactly-once per-event trailing-hour stats of a streaming
    * `(user_id, event_id, ts, value)` frame. */
  def rateWindow(events: DataFrame, delay: String = "30 minutes",
      horizonMs: Long = 30L * 24 * 3600 * 1000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // integer cents computed in the projection — the exact expression the
    // batch query aggregates, so the engines can never round differently;
    // casts sit BEFORE the watermark (see StreamingFunnel)
    val typed: Dataset[(Long, Long, java.sql.Timestamp, Long)] = events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts").cast("timestamp").as("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .withWatermark("ts", delay)
      .as[(Long, Long, java.sql.Timestamp, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(horizonMs))
      .toDF()
  }
}
