package graft

import java.nio.file.Files
import java.time.ZoneOffset

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.operators.Tables
import graft.streaming.StreamingRetention

/** The streaming cohort-retention twin: exactly-once per-(user, hour) cell
  * emissions rolled up sink-side must equal the oracle-checked batch
  * `events_retention` across a checkpointed kill/restart — cohorts first
  * seen before the restart must keep contributing cells after it — under
  * both state-store providers. */
class StreamingRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType)))

  /** (user, cohort epoch-micros, age). */
  private type Cell = (Long, Long, Long)

  private def scenario(buf: java.util.concurrent.ConcurrentLinkedQueue[Cell]): Unit = {
    val srcDir = Files.createTempDirectory("graft_ret_src").toString
    val ckpt = Files.createTempDirectory("graft_ret_ckpt").toString
    buf.clear()

    val ev = Tables.events(spark, sf()).select(col("user_id"), col("ts"))
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingRetention.cells(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            val t = r.getTimestamp(1)
            buf.add((r.getLong(0),
              t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L,
              r.getLong(2)))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(240000L),
        "streaming run timed out — a still-running query would collide with the next restart")
    }

    // run 1 usually emits nothing: a group only flushes when it receives
    // data AFTER the watermark advanced (one file -> one microbatch -> the
    // whole chunk is still buffered when the run ends)
    ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    // run 2: every active user's chunk-1 hours are now behind the recovered
    // watermark, so the incoming chunk-2 events flush them — cells from
    // BEFORE the restart, emitted after it, prove the buffer recovered
    ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(buf.size > 0, "run 2 must flush the recovered chunk-1 hours")

    // sentinel advances the watermark past every buffered event; its own
    // cells never emit (no later event closes user −1)
    Seq((-1L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val cells = buf.asScala.filter(_._1 >= 0L).toSeq
    assert(cells.distinct.size == cells.size, "cells must emit exactly once")
    val streaming = cells.groupBy(c => (c._2, c._3))
      .map { case (k, cs) => k -> cs.map(_._1).distinct.size.toLong }
    val batch = RelationalQueries.eventsRetention(spark, sf()).collect().map { r =>
      val ins = r.getAs[java.time.LocalDateTime](0).toInstant(ZoneOffset.UTC)
      (ins.getEpochSecond * 1000000L + ins.getNano / 1000L, r.getLong(1)) -> r.getLong(2)
    }.toMap
    assert(streaming == batch,
      s"streaming-only: ${(streaming.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streaming.toSet).take(3)}")
  }

  test("streaming retention cells equal batch events_retention across a kill/restart") {
    scenario(StreamingRetentionSpec.emitted)
  }

  test("same recovery under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try scenario(StreamingRetentionSpec.rocksEmitted)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object StreamingRetentionSpec {
  type Cell = (Long, Long, Long)
  val emitted: java.util.concurrent.ConcurrentLinkedQueue[Cell] =
    new java.util.concurrent.ConcurrentLinkedQueue[Cell]()
  val rocksEmitted: java.util.concurrent.ConcurrentLinkedQueue[Cell] =
    new java.util.concurrent.ConcurrentLinkedQueue[Cell]()
}
