package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the event-time histogram-quantile sketch
  * ([[graft.RelationalQueries.eventsHourlyQuantile]]): a watermarked
  * windowed aggregation emits each finalized hour's `(hour, b, cnt)`
  * HISTOGRAM CELLS exactly once in append mode — and because the sketch is
  * cell-wise mergeable, the read-off
  * ([[graft.RelationalQueries.histQuantileFromCells]]) over the streamed
  * cells equals the batch quantiles exactly. This is the property that
  * makes the fixed-memory sketch the production quantile at scale: the
  * engine's own windowed partial aggregation IS the sketch merge, state per
  * open window is ≤64 longs, and no percentile sort ever happens
  * in-stream.
  *
  * Late events beyond `delay` are dropped by the watermark — the package's
  * documented trade; a window emits once, when the watermark passes its
  * end. */
object StreamingHistQuantile {

  /** Finalized per-hour histogram cells of `round(value·100)` — schema
    * `(hour timestamp, b long, cnt long)`, cell index = integer bit length
    * exactly like the batch sketch. */
  def hourlyCells(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(
        window(col("ts"), "1 hour"),
        length(bin(round(col("value") * 100).cast("long"))).cast("long").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour"), col("b"), col("cnt"))
}
