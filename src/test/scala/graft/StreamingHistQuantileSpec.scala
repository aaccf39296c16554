package graft

import java.nio.file.Files
import java.time.ZoneOffset

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType, TimestampType}

import graft.operators.Tables
import graft.streaming.StreamingHistQuantile

/** The windowed histogram-sketch twin: finalized per-hour cells streamed
  * exactly once across a checkpointed kill/restart, and the shared
  * quantile read-off over them equals the oracle-checked batch
  * `events_hourly_quantile` — the sketch's cell-wise mergeability proven
  * through the engine's own windowed partial aggregation, under both
  * state-store providers. */
class StreamingHistQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  /** (hour-micros, b) -> cnt (java.lang.Long so putIfAbsent's null-means-
    * absent contract survives — a scala.Long value type unboxes the null
    * to 0 and breaks the duplicate check on the FIRST insert). */
  private type Cells = java.util.concurrent.ConcurrentHashMap[(Long, Long), java.lang.Long]

  private def scenario(cells: Cells): Unit = {
    val srcDir = Files.createTempDirectory("graft_shq_src").toString
    val ckpt = Files.createTempDirectory("graft_shq_ckpt").toString
    cells.clear()

    val ev = Tables.events(spark, sf()).select(col("event_id"), col("ts"), col("value"))
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingHistQuantile.hourlyCells(src)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach { r =>
            val t = r.getTimestamp(0).toInstant
            val key = (t.getEpochSecond * 1000000L + t.getNano / 1000L, r.getLong(1))
            // append-mode windows finalize exactly once: a duplicate key
            // would be an exactly-once violation, surfaced as a stream error
            val prev = cells.putIfAbsent(key, java.lang.Long.valueOf(r.getLong(2)))
            assert(prev eq null, s"cell $key emitted twice ($prev)")
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(240000L), "streaming run timed out")
    }

    ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val afterRun1 = cells.size
    assert(afterRun1 > 0, "run 1 must finalize windows")
    ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(cells.size > afterRun1, "run 2 must finalize its own windows")

    // sentinel: far-future event pushes the watermark past every real hour;
    // its own window never finalizes (nothing later)
    Seq((-1L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 0.0))
      .toDF("event_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    // the shared read-off over the streamed cells == the oracle-checked batch
    val streamed = cells.asScala.toSeq.map { case ((h, b), c) => (h, b, c.longValue) }
      .toDF("hour", "b", "cnt")
    val got = RelationalQueries.histQuantileFromCells(streamed, "hour")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val want = RelationalQueries.eventsHourlyQuantile(spark, sf()).collect().map { r =>
      val ins = r.getAs[java.time.LocalDateTime](0).toInstant(ZoneOffset.UTC)
      (ins.getEpochSecond * 1000000L + ins.getNano / 1000L) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))
    }.toMap
    assert(got.size == want.size, s"hour counts differ: ${got.size} vs ${want.size}")
    assert(got == want,
      s"streaming-only: ${(got.toSet -- want.toSet).take(3)}; " +
        s"batch-only: ${(want.toSet -- got.toSet).take(3)}")
  }

  test("streamed finalized cells reproduce batch events_hourly_quantile across a restart") {
    scenario(StreamingHistQuantileSpec.cells)
  }

  test("same under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try scenario(StreamingHistQuantileSpec.rocksCells)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object StreamingHistQuantileSpec {
  val cells = new java.util.concurrent.ConcurrentHashMap[(Long, Long), java.lang.Long]()
  val rocksCells = new java.util.concurrent.ConcurrentHashMap[(Long, Long), java.lang.Long]()
}
