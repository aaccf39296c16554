package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked streaming twin of the batch sessionization analytics
  * ([[graft.RelationalQueries.eventsSessions]]): Spark's native
  * `session_window` aggregation in append mode, emitting one row per
  * CLOSED session (watermark past the session end). The batch query's
  * per-user rollup is then a stateless aggregation over the emitted
  * sessions ([[perUser]]) — StreamingSessionsSpec proves the composition
  * equals the oracle-checked batch answer across a checkpointed
  * kill/restart, under both state-store providers.
  *
  * 100 TB shape: state is one (user, open-session) entry per active user,
  * keyed and shuffled by user_id only; the watermark bounds state size by
  * the activity horizon (gap + delay), so executor memory scales with
  * CONCURRENTLY-ACTIVE users, not corpus size. Late events beyond `delay`
  * are dropped by the watermark — the documented trade every
  * event-time-bounded ingest makes.
  */
object StreamingSessions {

  /** Closed sessions of a streaming `(user_id, ts)` frame: 30-minute
    * inactivity gap (the batch query's constant), watermark `delay` of
    * event-time lateness tolerance. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("evts"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("evts"))

  /** Roll emitted sessions up to the batch query's per-user shape
    * (`n_sessions`, `n_events`) — stateless, runs on the sink side. */
  def perUser(sessions: DataFrame): DataFrame =
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("evts").as("n_events"))

  /** Tumbling-window streaming twin of
    * [[graft.RelationalQueries.eventsHourly]]: 1-hour event-time buckets
    * per event type, watermarked append mode — each window emits exactly
    * once, when the watermark passes its end, so the union of emissions
    * across restarts IS the batch answer (value sums in integer cents, the
    * engine-portable discipline every money aggregate here uses). State is
    * one row per (open hour, event_type) — bounded by the lateness
    * horizon, independent of corpus size. */
  def hourly(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("sum_c"))
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("cnt"),
        (col("sum_c").cast("double") / 100.0).as("sum_value"))
}
