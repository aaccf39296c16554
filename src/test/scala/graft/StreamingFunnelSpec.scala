package graft

import java.nio.file.Files
import java.time.ZoneOffset

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.operators.Tables
import graft.streaming.StreamingFunnel

/** The streaming ordered-funnel twin (VERDICT r6 item 5): buffered
  * flatMapGroupsWithState over the real events corpus must equal the
  * oracle-checked batch `events_funnel` across a checkpointed kill/restart
  * — a funnel whose steps STRADDLE the restart boundary only completes if
  * the buffered/folded state survives recovery — under both state-store
  * providers. Reuses StreamingSessionsSpec's two-chunk + far-future
  * sentinel machinery (the sentinel pushes every user past the inactivity
  * horizon, closing all funnels). */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_type", StringType)))

  /** (user, t1, t2, t3 as epoch-micros or 0, steps). */
  private type Emitted = (Long, Long, Long, Long, Long)

  private def us(t: java.sql.Timestamp): Long =
    if (t == null) 0L
    else t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def scenario(buf: java.util.concurrent.ConcurrentLinkedQueue[Emitted]): Unit = {
    val srcDir = Files.createTempDirectory("graft_fun_src").toString
    val ckpt = Files.createTempDirectory("graft_fun_ckpt").toString
    buf.clear()

    val ev = Tables.events(spark, sf()).select(col("user_id"), col("ts"), col("event_type"))
    // mid-corpus cut: many users' funnels have steps on both sides, so the
    // final rows are only right if buffer + accumulator state recovers
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingFunnel.funnel(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            buf.add((r.getLong(0), us(r.getTimestamp(1)), us(r.getTimestamp(2)),
              us(r.getTimestamp(3)), r.getLong(4)))
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
    // no funnel may close before the sentinel: the corpus spans one month,
    // well inside the 30-day inactivity horizon
    assert(buf.isEmpty, s"funnels closed early: ${buf.asScala.take(3)}")

    ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(buf.isEmpty, s"funnels closed early: ${buf.asScala.take(3)}")

    // sentinel: a far-future funnel event pushes the watermark past every
    // user's horizon, timing out and emitting every funnel
    Seq((-1L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type").coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val streaming = buf.asScala.filter(_._1 >= 0L)
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    val batch = RelationalQueries.eventsFunnel(spark, sf()).collect().map { r =>
      def u(i: Int): Long =
        if (r.isNullAt(i)) 0L
        else {
          val ldt = r.getAs[java.time.LocalDateTime](i)
          val ins = ldt.toInstant(ZoneOffset.UTC)
          ins.getEpochSecond * 1000000L + ins.getNano / 1000L
        }
      r.getLong(0) -> ((u(1), u(2), u(3), r.getLong(4)))
    }.toMap
    assert(streaming.size == batch.size,
      s"row counts differ: streaming ${streaming.size} vs batch ${batch.size}")
    assert(streaming == batch,
      s"streaming-only: ${(streaming.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streaming.toSet).take(3)}")
  }

  test("streaming funnel equals batch events_funnel across a kill/restart") {
    scenario(StreamingFunnelSpec.emitted)
  }

  test("same recovery under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try scenario(StreamingFunnelSpec.rocksEmitted)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object StreamingFunnelSpec {
  type Emitted = (Long, Long, Long, Long, Long)
  val emitted: java.util.concurrent.ConcurrentLinkedQueue[Emitted] =
    new java.util.concurrent.ConcurrentLinkedQueue[Emitted]()
  val rocksEmitted: java.util.concurrent.ConcurrentLinkedQueue[Emitted] =
    new java.util.concurrent.ConcurrentLinkedQueue[Emitted]()
}
