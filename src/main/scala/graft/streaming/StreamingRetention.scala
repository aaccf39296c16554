package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermarked streaming twin of the batch cohort-retention matrix
  * ([[graft.RelationalQueries.eventsRetention]]): per-user
  * `flatMapGroupsWithState` emits one `(cohort_hour, age)` cell
  * contribution per (user, active hour), exactly once; the matrix rollup
  * (`count(DISTINCT user)` per cell = count of the exactly-once emissions)
  * is then a stateless aggregation on the sink side — the same
  * emit-then-roll-up composition the sessionization twin uses.
  *
  * Correctness model: a user's COHORT is the hour of their earliest event.
  * Under a watermark, the earliest FINALIZED event (ts < watermark) is the
  * global earliest — any not-yet-seen event carries ts ≥ watermark — so the
  * cohort is final as soon as the user has any finalized event, and every
  * finalized active hour `h` can emit its `(cohort, h − cohort)` cell
  * immediately. Events buffer in state until the watermark passes them;
  * an emitted-ages set (the user's retention-matrix row, bounded by the
  * user's distinct active hours — the same cardinality the batch DISTINCT
  * holds) dedups multi-event hours. State removes on event-time timeout
  * after `horizonMs` of inactivity.
  *
  * 100 TB shape: keyed and shuffled by user_id only; state per active user
  * = lateness-window buffer + cohort + the emitted-hours set. Late events
  * beyond `delay` are dropped by the watermark — the documented trade of
  * every twin in this package. */
object StreamingRetention {

  final case class RState(bufUs: List[Long], cohortUs: Long, emittedAges: List[Long],
      maxTsUs: Long)

  /** One emission per (user, cohort, age) — `user_id` rides along so the
    * sink-side rollup can count users per cell. */
  final case class ROut(user_id: Long, cohort_hour: java.sql.Timestamp, age: Long)

  private val HourUs = 3600L * 1000000L

  private def toUs(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def hourFloor(us: Long): Long = us - (us % HourUs)

  private def toTs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  private def update(horizonMs: Long)(user: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      state: GroupState[RState]): Iterator[ROut] = {
    if (state.hasTimedOut) {
      // watermark has passed everything buffered (timeout ≥ maxTs+horizon):
      // flush the remaining hours, then drop the state
      val st = state.get
      val outs = flush(user, st, st.bufUs)
      state.remove()
      outs
    } else {
      val st = state.getOption.getOrElse(RState(Nil, 0L, Nil, 0L))
      val incoming = rows.map { case (_, ts) => toUs(ts) }.toList
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (fin, keep) = (st.bufUs ++ incoming).partition(_ < wmUs)
      val maxTs = (st.maxTsUs :: incoming).max
      val outs = flush(user, st, fin)
      // flush() folded fin into cohort/emitted via its returned rows; redo
      // the state bookkeeping here (flush is pure)
      val cohort =
        if (st.cohortUs != 0L) st.cohortUs
        else if (fin.nonEmpty) hourFloor(fin.min) else 0L
      val newAges =
        if (cohort == 0L) Nil
        else fin.map(us => (hourFloor(us) - cohort) / HourUs)
          .distinct.filterNot(st.emittedAges.contains)
      state.update(RState(keep, cohort,
        st.emittedAges ++ newAges, maxTs))
      state.setTimeoutTimestamp(maxTs / 1000L + horizonMs)
      outs
    }
  }

  /** Cells newly contributed by finalizing `fin` against state `st` —
    * pure: the caller owns the matching state update. */
  private def flush(user: Long, st: RState, fin: List[Long]): Iterator[ROut] = {
    if (fin.isEmpty) Iterator.empty
    else {
      val cohort = if (st.cohortUs != 0L) st.cohortUs else hourFloor(fin.min)
      fin.map(us => (hourFloor(us) - cohort) / HourUs)
        .distinct.filterNot(st.emittedAges.contains)
        .sorted
        .map(age => ROut(user, toTs(cohort), age))
        .iterator
    }
  }

  /** Exactly-once `(user, cohort_hour, age)` cell emissions of a streaming
    * `(user_id, ts)` frame. Roll up with [[matrix]] for the batch shape. */
  def cells(events: DataFrame, delay: String = "30 minutes",
      horizonMs: Long = 30L * 24 * 3600 * 1000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // casts BEFORE the watermark (see StreamingFunnel: a post-watermark
    // projection of the event-time column loses the tag)
    val typed: Dataset[(Long, java.sql.Timestamp)] = events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", delay)
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(horizonMs))
      .toDF()
  }

  /** Roll emitted cells up to the batch matrix (`cohort_hour, age,
    * n_users`) — stateless, runs on the sink side; the exactly-once cell
    * emission makes `count(*)` ≡ the batch `count(DISTINCT user_id)`. */
  def matrix(cells: DataFrame): DataFrame =
    cells.groupBy("cohort_hour", "age")
      .agg(count(lit(1)).as("n_users"))
}
