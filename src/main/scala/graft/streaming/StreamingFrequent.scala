package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch heavy-hitter question
  * ([[graft.RelationalQueries.heavyHitters]]): WHICH users have reached
  * `minSupport` events — emitted incrementally, each user ONCE, in the
  * micro-batch where their running count crosses the threshold.
  *
  * The batch side is a Count-Min sketch because a one-shot scan over an
  * at-rest corpus can afford no per-key state until the candidate sliver;
  * an incremental exactly-once detector is the opposite trade — it MUST
  * hold per-key state (a crossing is a fact about a key's whole history),
  * and in exchange the answer is exact, no sketch: state is ONE long per
  * user in the state store (RocksDB at scale), each event folds once, and
  * checkpoint replay reproduces emissions deterministically. The two
  * forms answer the same question from opposite ends, and the spec proves
  * the emitted set ≡ the batch query's `confirmed` users on the same
  * corpus across a kill/restart.
  *
  * Emission carries the running count AT the crossing batch boundary
  * (≥ `minSupport`, ≤ the final count — batches are fold units). */
object StreamingFrequent {

  final case class Crossing(user_id: Long, count_at_crossing: Long)

  def frequentUsers(events: DataFrame, minSupport: Long): Dataset[Crossing] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (u: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          if (prev < minSupport && next >= minSupport) Iterator(Crossing(u, next))
          else Iterator.empty
      }
  }

  /** [[frequentUsers]] with WATERMARK-BOUNDED state — the TTL variant for
    * unbounded user populations (the corpus-lifetime form above holds one
    * Long per user EVER seen; this one holds one Long per user active
    * within the `ttlMs` event-time horizon).
    *
    * Semantics (documented, spec-pinned): a user idle for `ttlMs` of
    * EVENT time past their last event (once the watermark — bounded by
    * `watermarkDelay` of lateness — passes that deadline) is EVICTED; a
    * re-arriving evicted user restarts counting from zero, and a
    * re-crossing RE-EMITS. So "frequent" means "reached `minSupport`
    * within one activity span", not "ever" — the standard state-size /
    * memory-horizon trade, the same one [[StreamingDedup
    * .firstOccurrencesWithinWatermark]] makes for fingerprints (and the
    * same J5 lesson the merge's timeout eviction applies to the
    * reference's state leak). Watermark-driven, so eviction is
    * deterministic on checkpoint replay. */
  def frequentUsersTtl(events: DataFrame, minSupport: Long, ttlMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Crossing] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (u: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past the horizon: forget the count
            Iterator.empty
          } else {
            val rs = rows.toSeq
            val prev = state.getOption.getOrElse(0L)
            val next = prev + rs.size
            state.update(next)
            // deadline rides the user's LAST event; the watermark floor
            // keeps it valid when a late batch carries only old timestamps
            val maxTs = rs.iterator.map(_._2.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs()) + ttlMs)
            if (prev < minSupport && next >= minSupport) Iterator(Crossing(u, next))
            else Iterator.empty
          }
      }
  }
}
