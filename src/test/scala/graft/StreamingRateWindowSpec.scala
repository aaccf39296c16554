package graft

import java.nio.file.Files
import java.time.ZoneOffset

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType, TimestampType}

import graft.operators.Tables
import graft.streaming.StreamingRateWindow

/** The streaming trailing-hour rate-window twin: exactly-once per-event
  * emissions must equal the oracle-checked batch `events_rate_window`
  * across a checkpointed kill/restart — events just after the restart
  * need frame members from just before it, so the per-user buffer must
  * recover — under both state-store providers. */
class StreamingRateWindowSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  /** (event_id, user, ts-micros, n, v). */
  private type Row5 = (Long, Long, Long, Long, Double)

  private def scenario(buf: java.util.concurrent.ConcurrentLinkedQueue[Row5]): Unit = {
    val srcDir = Files.createTempDirectory("graft_rw_src").toString
    val ckpt = Files.createTempDirectory("graft_rw_ckpt").toString
    buf.clear()

    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingRateWindow.rateWindow(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            val t = r.getTimestamp(2)
            buf.add((r.getLong(0), r.getLong(1),
              t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L,
              r.getLong(3), r.getDouble(4)))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(240000L),
        "streaming run timed out — a still-running query would collide with the next restart")
    }

    ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(buf.size > 0, "run 2 must emit the events run 1's watermark finalized")

    // sentinel: far-future event advances the watermark past everything and
    // times every user out; its own emission never fires (no later event)
    Seq((-1L, -1L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 0.0))
      .toDF("user_id", "event_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val rows = buf.asScala.filter(_._2 >= 0L).toSeq
    assert(rows.map(_._1).distinct.size == rows.size, "events must emit exactly once")
    val streaming = rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val batch = RelationalQueries.eventsRateWindow(spark, sf()).collect().map { r =>
      val ins = r.getAs[java.time.LocalDateTime](2).toInstant(ZoneOffset.UTC)
      r.getLong(0) -> ((r.getLong(1),
        ins.getEpochSecond * 1000000L + ins.getNano / 1000L,
        r.getLong(3), r.getDouble(4)))
    }.toMap
    assert(streaming.size == batch.size,
      s"row counts differ: streaming ${streaming.size} vs batch ${batch.size}")
    assert(streaming == batch,
      s"streaming-only: ${(streaming.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streaming.toSet).take(3)}")
  }

  test("streaming rate window equals batch events_rate_window across a kill/restart") {
    scenario(StreamingRateWindowSpec.emitted)
  }

  test("same recovery under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try scenario(StreamingRateWindowSpec.rocksEmitted)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object StreamingRateWindowSpec {
  type Row5 = (Long, Long, Long, Long, Double)
  val emitted: java.util.concurrent.ConcurrentLinkedQueue[Row5] =
    new java.util.concurrent.ConcurrentLinkedQueue[Row5]()
  val rocksEmitted: java.util.concurrent.ConcurrentLinkedQueue[Row5] =
    new java.util.concurrent.ConcurrentLinkedQueue[Row5]()
}
