package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}

import graft.operators.Tables
import graft.streaming.StreamingAsofJoin

/** The streaming AS-OF join twin: per purchase, the most recent same-user
  * click at or before it, emitted exactly once — must equal the
  * oracle-checked batch `events_asof_join` across a checkpointed
  * kill/restart (a post-restart purchase answered by a PRE-restart click
  * only works if the best-finalized-click state recovers), under both
  * state-store providers. */
class StreamingAsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** (purchase id, click id or -1, click us or -1, cents or -1). */
  private type Row4 = (Long, Long, Long, Long)

  private def scenario(buf: java.util.concurrent.ConcurrentLinkedQueue[Row4]): Unit = {
    val srcDir = Files.createTempDirectory("graft_asof_src").toString
    val ckpt = Files.createTempDirectory("graft_asof_ckpt").toString
    buf.clear()

    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingAsofJoin.purchaseLastClick(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            def opt(i: Int): Long = if (r.isNullAt(i)) -1L else r.getLong(i)
            buf.add((r.getLong(0), opt(1), opt(2), opt(3)))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(240000L), "streaming as-of run timed out")
    }

    ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    // far-future click for a user with no purchases: pushes the global
    // watermark past every real user's inactivity horizon so all scopes
    // close and flush, without emitting rows of its own
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0).toInstant
    Seq((900001L, java.sql.Timestamp.from(maxTs.plusSeconds(40L * 24 * 3600)),
        999999L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val got = buf.asScala.toSeq
    assert(got.map(_._1).distinct.size == got.size,
      "each purchase must emit exactly once across the restarts")

    // ground truth: the batch as-of twin over the same corpus
    val want = graft.RelationalQueries.eventsAsofJoin(spark, sf()).collect()
      .map { r =>
        def opt(i: Int): Long = if (r.isNullAt(i)) -1L else r.getLong(i)
        (r.getLong(0), opt(1), opt(2), opt(3))
      }.toSet
    assert(want.nonEmpty && want.exists(_._2 >= 0L), "fixture must have matches")
    assert(got.toSet == want,
      s"stream-only: ${(got.toSet -- want).take(3)}; batch-only: ${(want -- got.toSet).take(3)}")

    // the restart is load-bearing: some post-cut purchase is answered by a
    // pre-cut click (the best-finalized-click state crossed the restart)
    val tsMs = Tables.events(spark, sf()).select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).toInstant.toEpochMilli).toMap
    val cutMs = cut.toInstant.toEpochMilli
    assert(got.exists { case (pid, cid, _, _) =>
      cid >= 0L && tsMs(pid) >= cutMs && tsMs(cid) < cutMs
    }, "expected a pre-restart click answering a post-restart purchase")
  }

  test("streaming as-of equals the batch twin across a kill/restart") {
    scenario(StreamingAsofJoinSpec.emitted)
  }

  test("same recovery under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try scenario(StreamingAsofJoinSpec.rocksEmitted)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("tolerance form: streaming equals the batch events_asof_tolerance; boundary inclusive") {
    // pure-transition boundary: a click EXACTLY toleranceUs old still
    // answers (matches the batch `c_us >= p_us - T` inclusive band); one
    // microsecond older nulls — while the 3-long state keeps tracking it
    import StreamingAsofJoin.{foldSorted, AEvent, AState}
    val st0 = AState(Nil, -1L, -1L, -1L, 0L)
    val evs = Seq(AEvent(1000L, 0, 7L, 42L),
      AEvent(1000L + 30L, 1, 100L, 0L), // 30 µs later, tol 30 → fresh
      AEvent(1000L + 31L, 1, 101L, 0L)) // 31 µs later → stale ⇒ nulls
    val (_, outs) = foldSorted(st0, evs, tolUs = 30L)
    assert(outs.map(o => (o.event_id, o.click_id)) ==
      List((100L, Some(7L)), (101L, None)),
      s"tolerance boundary must be inclusive: $outs")

    // end-to-end: one AvailableNow pass (+ watermark pusher) with the
    // 30-minute tolerance equals the oracle-checked batch operator
    val srcDir = Files.createTempDirectory("graft_asoft_src").toString
    val ckpt = Files.createTempDirectory("graft_asoft_ckpt").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row4]()
    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    ev.coalesce(1).write.mode("append").parquet(srcDir)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0).toInstant
    Seq((900001L, java.sql.Timestamp.from(maxTs.plusSeconds(40L * 24 * 3600)),
        999999L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val q = StreamingAsofJoin.purchaseLastClick(src, toleranceUs = 1800000000L)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          def opt(i: Int): Long = if (r.isNullAt(i)) -1L else r.getLong(i)
          buf.add((r.getLong(0), opt(1), opt(2), opt(3)))
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(240000L), "streaming tolerance as-of timed out")
    val want = graft.RelationalQueries.eventsAsofJoinTolerance(spark, sf()).collect()
      .map { r =>
        def opt(i: Int): Long = if (r.isNullAt(i)) -1L else r.getLong(i)
        (r.getLong(0), opt(1), opt(2), opt(3))
      }.toSet
    val got = buf.asScala.toSet
    // the bound must bite in the fixture AND some matches survive it
    assert(want.exists(_._2 < 0L) && want.exists(_._2 >= 0L))
    assert(got == want,
      s"stream-only: ${(got -- want).take(3)}; batch-only: ${(want -- got).take(3)}")
  }
}

object StreamingAsofJoinSpec {
  type Row4 = (Long, Long, Long, Long)
  val emitted: java.util.concurrent.ConcurrentLinkedQueue[Row4] =
    new java.util.concurrent.ConcurrentLinkedQueue[Row4]()
  val rocksEmitted: java.util.concurrent.ConcurrentLinkedQueue[Row4] =
    new java.util.concurrent.ConcurrentLinkedQueue[Row4]()
}
