package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermarked streaming twin of the batch AS-OF join
  * ([[graft.RelationalQueries.eventsAsofJoin]]): per purchase, the most
  * recent same-user click at or before it, emitted exactly once in append
  * mode.
  *
  * Why this is a `flatMapGroupsWithState` and not a stream-stream join:
  * "most recent at or before" is an ORDER-dependent selection, not a range
  * predicate — a symmetric hash join would emit every qualifying pair and
  * still need a per-purchase argmax aggregation downstream, buffering every
  * click against every future purchase forever (no upper time bound ⇒ no
  * derivable click-state horizon). The keyed fold keeps the state the
  * semantics actually need:
  *
  *   - a purchase FINALIZES once the watermark passes its timestamp — no
  *     click at or before it can still arrive (late rows beyond the
  *     watermark are dropped), so its answer is exact;
  *   - of the finalized clicks, only the LATEST (max `(ts, id)`) can ever
  *     answer a future purchase (any admissible future purchase's
  *     timestamp is past the watermark, hence past every finalized click),
  *     so finalized clicks collapse to THREE LONGS of state;
  *   - events still inside the lateness window buffer until the watermark
  *     passes them, then fold in `(ts, kind, id)` order — clicks sort
  *     before purchases at equal timestamps, making `c_ts <= p_ts`
  *     inclusive, and ties break to the highest click id, exactly the
  *     batch operator's ordering.
  *
  * State per active user = 3 longs + the in-flight lateness buffer —
  * memory scales with concurrently-active users × lateness horizon, never
  * with history (the 100 TB shape; same argument as [[StreamingFunnel]]).
  * A user's as-of scope closes after `horizonMs` of event-time inactivity
  * (remaining buffered purchases flush with their answers; a horizon
  * longer than the corpus span reproduces the batch answer exactly —
  * StreamingAsofJoinSpec proves ≡ across a checkpointed kill/restart under
  * both state-store providers). */
object StreamingAsofJoin {

  /** Buffered event: epoch-micros, kind (0 = click, 1 = purchase), id,
    * cents (clicks only). */
  final case class AEvent(tsUs: Long, k: Int, id: Long, cents: Long)

  /** Group state: in-flight buffer, the best finalized click (-1 = none),
    * and the max event time seen (drives the inactivity timeout). */
  final case class AState(buf: List[AEvent], bestUs: Long, bestId: Long,
      bestCents: Long, maxTsUs: Long)

  /** One emitted row per finalized purchase — the batch twin's shape. */
  final case class AOut(event_id: Long, click_id: Option[Long],
      click_us: Option[Long], click_cents: Option[Long])

  private def toUs(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Fold finalized events in (ts, kind, id) order: clicks advance the
    * best-click watermark state, purchases read it — nulled when the best
    * click is older than `tolUs` (the staleness-bounded as-of form; the
    * default ∞ reproduces the unbounded join). The TOLERANCE cannot shrink
    * the 3-long state: a stale best click must still be tracked, because
    * whether it answers depends on each future purchase's OWN timestamp. */
  private[graft] def foldSorted(st: AState, evs: Seq[AEvent],
      tolUs: Long = Long.MaxValue): (AState, List[AOut]) = {
    var (bu, bi, bc) = (st.bestUs, st.bestId, st.bestCents)
    val outs = scala.collection.mutable.ListBuffer.empty[AOut]
    evs.sortBy(e => (e.tsUs, e.k, e.id)).foreach { e =>
      if (e.k == 0) {
        // arrival order within the sort is ascending, so each click is ≥
        // the current best; ties on ts resolve to the higher id last
        bu = e.tsUs; bi = e.id; bc = e.cents
      } else {
        outs += (if (bi < 0L || e.tsUs - bu > tolUs) AOut(e.id, None, None, None)
          else AOut(e.id, Some(bi), Some(bu), Some(bc)))
      }
    }
    (st.copy(bestUs = bu, bestId = bi, bestCents = bc), outs.toList)
  }

  private def update(horizonMs: Long, tolUs: Long)(user: Long,
      rows: Iterator[(Long, java.sql.Timestamp, String, Long, Long)],
      state: GroupState[AState]): Iterator[AOut] = {
    if (state.hasTimedOut) {
      val st = state.get
      val (_, outs) = foldSorted(st, st.buf, tolUs)
      state.remove()
      outs.iterator
    } else {
      val st = state.getOption.getOrElse(AState(Nil, -1L, -1L, -1L, 0L))
      val incoming = rows.map { case (_, ts, et, id, cents) =>
        AEvent(toUs(ts), if (et == "click") 0 else 1, id, cents)
      }.toList
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (fin, keep) = (st.buf ++ incoming).partition(_.tsUs < wmUs)
      val (advanced, outs) = foldSorted(st, fin, tolUs)
      val maxTs = (st.maxTsUs :: incoming.map(_.tsUs)).max
      state.update(advanced.copy(buf = keep, maxTsUs = maxTs))
      state.setTimeoutTimestamp(maxTs / 1000L + horizonMs)
      outs.iterator
    }
  }

  /** As-of rows of a streaming `(event_id, ts, user_id, event_type, value)`
    * frame: one row per purchase, its most recent same-user click at or
    * before it (`click_cents` = `round(value*100)` like the batch twin). */
  def purchaseLastClick(events: DataFrame, delay: String = "30 minutes",
      horizonMs: Long = 30L * 24 * 3600 * 1000,
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, java.sql.Timestamp, String, Long, Long)] = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_type").cast("string").as("event_type"),
        col("event_id").cast("long").as("event_id"),
        coalesce(round(col("value") * 100).cast("long"), lit(0L)).as("cents"))
      .withWatermark("ts", delay)
      .as[(Long, java.sql.Timestamp, String, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(horizonMs, toleranceUs))
      .toDF()
  }
}
