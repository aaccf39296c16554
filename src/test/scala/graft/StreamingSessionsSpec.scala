package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.operators.Tables
import graft.streaming.StreamingSessions

/** The events-family streaming twin (VERDICT r5 item 8): watermarked
  * `session_window` sessionization over the real events corpus must equal
  * the oracle-checked batch `events_sessions` across a checkpointed
  * kill/restart — sessions SPANNING the restart boundary only merge if
  * session state survives recovery — under both state-store providers. */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType)))

  /** Feed the sf0.001 events corpus in two time-split chunks with a
    * restart between them, then a far-future sentinel (user −1) that
    * pushes the watermark past every real session. Time-splitting keeps
    * run-2 events ahead of run-1's watermark, so nothing is dropped as
    * late and the batch answer is the exact target. */
  private def scenario(buf: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]): Unit = {
    val srcDir = Files.createTempDirectory("graft_sess_src").toString
    val ckpt = Files.createTempDirectory("graft_sess_ckpt").toString
    buf.clear()

    val ev = Tables.events(spark, sf()).select(col("user_id"), col("ts"))
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingSessions.sessions(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select(col("user_id"), col("evts")).as[(Long, Long)]
            .collect().foreach(buf.add)
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(240000L),
        "streaming run timed out — a still-running query would collide with the next restart")
    }

    // run 1: first half of the month -> checkpointed "kill" mid-corpus
    ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val afterRun1 = buf.size
    assert(afterRun1 > 0, "run 1 must emit the sessions its watermark closed")

    // run 2 (restart from checkpoint): second half; boundary sessions merge
    // with recovered open-session state
    ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    // run 3: sentinel advances the watermark past every real session
    Seq((-1L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    // emitted closed sessions, rolled up per user = the batch answer
    val streaming = buf.asScala.toSeq.filter(_._1 >= 0L)
      .groupBy(_._1).map { case (u, ss) => u -> ((ss.size.toLong, ss.map(_._2).sum)) }
    val batch = RelationalQueries.eventsSessions(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streaming == batch,
      s"streaming-only: ${(streaming.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streaming.toSet).take(3)}")
    assert(afterRun1 < buf.size, "the restart must add the remaining sessions")
  }

  test("streaming hourly windows equal batch events_hourly across a kill/restart (boundary window spans it)") {
    val srcDir = Files.createTempDirectory("graft_hr_src").toString
    val ckpt = Files.createTempDirectory("graft_hr_ckpt").toString
    val buf = StreamingSessionsSpec.hourlyEmitted
    buf.clear()

    val ev = Tables.events(spark, sf()).select(col("ts"), col("event_type"), col("value"))
    // MID-hour cut: the [00:00, 01:00) window of Jan 16 has events on both
    // sides of the restart, so its count/sum are only right if the open
    // window's state survives recovery
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:30:00")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      StructField("ts", TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = graft.streaming.StreamingSessions.hourly(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => buf.add(
            (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))))
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
    // sentinel pushes the watermark past every real window; its own open
    // window never emits
    Seq((java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), "sentinel", 0.0))
      .toDF("ts", "event_type", "value").coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val streaming = buf.asScala.toSet.filterNot(_._2 == "sentinel")
    val batch = RelationalQueries.eventsHourly(spark, sf()).collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streaming == batch,
      s"streaming-only: ${(streaming -- batch).take(3)}; batch-only: ${(batch -- streaming).take(3)}")
  }

  test("streaming sessionization equals batch events_sessions across a kill/restart") {
    scenario(StreamingSessionsSpec.emitted)
  }

  test("same recovery under the RocksDB state store provider (the 100x-scale store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try scenario(StreamingSessionsSpec.rocksEmitted)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object StreamingSessionsSpec {
  val emitted: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)] =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
  val rocksEmitted: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)] =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
  val hourlyEmitted: java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long, Double)] =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long, Double)]()
}
