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
      q.awaitTermination(240000L)
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
}
