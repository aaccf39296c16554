package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM time-interval join — the streaming twin of the
  * batch keyless range join's matching core
  * ([[graft.RelationalQueries.eventsIntervalJoin]]): every
  * (purchase, click) pair with the click in the purchase's trailing hour
  * (both endpoints inclusive), emitted exactly once in append mode. This is
  * the one stateful-operator family the engine had not exercised yet —
  * every other streaming op is a keyed `flatMapGroupsWithState` or a
  * stream-static join; here BOTH sides are unbounded and Spark's symmetric
  * hash join buffers each in the state store.
  *
  * The batch operator's manufactured equi key carries over, and in
  * streaming it earns its keep twice: Spark plans the join as
  * StreamingSymmetricHashJoin PARTITIONED on the bucket (state and matching
  * shard across executors exactly like the batch shuffle — a keyless
  * stream-stream join would compare every buffered row pair per trigger),
  * and the two-consecutive-buckets covering argument (see
  * [[graft.RelationalQueries.eventsIntervalJoin]]) again guarantees a pair
  * can only meet in the click's own bucket, so the 2× exploded purchase
  * side never duplicates a match.
  *
  * State bounding is the WATERMARK's job, not a timeout's: both sides carry
  * `withWatermark(ts, delay)`, and the range predicate on the two
  * watermarked timestamp columns lets Spark derive each side's state
  * horizon (a click is droppable once no future purchase can reach back to
  * it: `c_ts < wm − 1h`; a purchase once `p_ts < wm`). Late events beyond
  * `delay` are dropped by the watermark — the package's documented trade.
  *
  * Inner semantics only, deliberately: the batch LEFT join's zero-click
  * purchases cannot ride the exploded side (both exploded rows of an
  * unmatched purchase would emit, and the bucket that did not match would
  * emit a spurious null row even for matched purchases) — an outer
  * variant belongs to a downstream anti-join against the purchase stream,
  * or to the batch aggregate. The spec proves the pair set ≡ the batch
  * inner pairs across a checkpointed kill/restart, under both state-store
  * providers. */
object StreamingIntervalJoin {

  private val HourUs = 3600L * 1000000L

  /** The watermarked bucketed join itself, all columns kept —
    * [[purchaseClickPairs]] projects the pair view, [[purchaseClickStats]]
    * aggregates on top. */
  private def joined(events: DataFrame, delay: String): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
      .withColumn("p_us", unix_micros(col("p_ts")))
      .withColumn("bucket", explode(array(
        expr(s"p_us div ${HourUs}L - 1L"), expr(s"p_us div ${HourUs}L"))))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"),
        round(col("value") * 100).cast("long").as("click_cents"))
      .withWatermark("c_ts", delay)
      .withColumn("bucket", expr(s"unix_micros(c_ts) div ${HourUs}L"))
    p.join(c, p("bucket") === c("bucket") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("c_ts") <= col("p_ts"))
  }

  /** All (purchase event_id, click event_id, click cents) pairs with the
    * click inside the purchase's trailing hour. `events` is a streaming
    * frame with at least (event_id, ts, event_type, value). */
  def purchaseClickPairs(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    joined(events, delay)
      .select(col("p_id").as("event_id"), col("click_id"), col("click_cents"))

  /** The BATCH output shape in-stream: per-purchase click count and value
    * ([[graft.RelationalQueries.eventsIntervalJoin]]'s aggregate), as a
    * second stateful operator CHAINED after the stream-stream join — a
    * watermarked event-time-window aggregation over the join's output
    * (Spark propagates the joined watermark through, so each purchase's
    * group finalizes and emits EXACTLY ONCE in append mode when the
    * watermark passes its hour window).
    *
    * Two deliberate deltas vs the batch aggregate, both inherent to the
    * streaming shape: (a) inner-only — zero-click purchases never enter
    * the join output, so they have no group to finalize (the batch LEFT
    * join reports them as 0; in-stream that set is a downstream anti-join
    * concern, same argument as [[purchaseClickPairs]]); (b) a purchase
    * emits only once its window CLOSES under the watermark — the
    * exactly-once-per-purchase contract a replayed/restarted stream keeps,
    * spec-proven ≡ the batch aggregate for every closed purchase across a
    * kill/restart under both state-store providers. */
  def purchaseClickStats(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    joined(events, delay)
      .groupBy(col("p_id"), window(col("p_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_clicks"),
        (sum(col("click_cents")).cast("double") / 100.0).as("click_value"))
      .select(col("p_id").as("event_id"), col("n_clicks"), col("click_value"))
}
