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

  /** The PURE state transition (property-tested directly by
    * RetentionPropertySpec): absorb `incoming` (all `ts ≥` the previous
    * watermark), finalize everything the watermark passed, fix the cohort
    * on first finalization (nothing earlier can arrive), emit each newly
    * covered `(cohort, age)` cell once, keep the rest buffered.
    * `wm = Long.MaxValue` flushes everything (the timeout path). */
  private[graft] def advance(user: Long, st: RState, incoming: List[Long],
      wmUs: Long): (List[ROut], RState) = {
    val (fin, keep) = (st.bufUs ++ incoming).partition(_ < wmUs)
    // −1 = cohort unset: 0 is a LEGITIMATE cohort (an epoch-hour-zero
    // event), and using it as the sentinel let a second segment recompute
    // the cohort — caught by RetentionPropertySpec
    val cohort =
      if (st.cohortUs >= 0L) st.cohortUs
      else if (fin.nonEmpty) hourFloor(fin.min) else -1L
    val newAges =
      if (cohort < 0L) Nil
      else fin.map(us => (hourFloor(us) - cohort) / HourUs)
        .distinct.filterNot(st.emittedAges.contains).sorted
    val maxTs = (st.maxTsUs :: incoming).max
    (newAges.map(age => ROut(user, toTs(cohort), age)),
      RState(keep, cohort, st.emittedAges ++ newAges, maxTs))
  }

  private def update(horizonMs: Long)(user: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      state: GroupState[RState]): Iterator[ROut] = {
    if (state.hasTimedOut) {
      // watermark has passed everything buffered (timeout ≥ maxTs+horizon):
      // flush the remaining hours, then drop the state
      val (outs, _) = advance(user, state.get, Nil, Long.MaxValue)
      state.remove()
      outs.iterator
    } else {
      val st = state.getOption.getOrElse(RState(Nil, -1L, Nil, 0L))
      val incoming = rows.map { case (_, ts) => toUs(ts) }.toList
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (outs, next) = advance(user, st, incoming, wmUs)
      state.update(next)
      state.setTimeoutTimestamp(next.maxTsUs / 1000L + horizonMs)
      outs.iterator
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
