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
}
