package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}

import graft.operators.Tables
import graft.streaming.StreamingIntervalJoin

/** The stream-stream time-interval join twin: the appended
  * (purchase, click) pairs must equal the batch inner range-join pairs
  * exactly once across a checkpointed kill/restart — run-2 purchases need
  * run-1 clicks still buffered in the join state, so the symmetric hash
  * join's store must recover — under both state-store providers. */
class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  /** (purchase event_id, click event_id, click cents). */
  private type Pair = (Long, Long, Long)

  private def scenario(buf: java.util.concurrent.ConcurrentLinkedQueue[Pair]): Unit = {
    val srcDir = Files.createTempDirectory("graft_ssj_src").toString
    val ckpt = Files.createTempDirectory("graft_ssj_ckpt").toString
    buf.clear()

    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    // chosen so at least one (purchase, click) pair SPANS the restart:
    // click 515 at 21:58 arrives in run 1, purchase 517 at 22:19 in run 2
    val cut = java.sql.Timestamp.valueOf("2024-01-15 22:00:00")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingIntervalJoin.purchaseClickPairs(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            buf.add((r.getLong(0), r.getLong(1), r.getLong(2)))
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
    val afterRun1 = buf.size
    ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(buf.size > afterRun1, "run 2 must emit pairs of its own")

    val pairs = buf.asScala.toSeq
    assert(pairs.map(p => (p._1, p._2)).distinct.size == pairs.size,
      "each (purchase, click) pair must emit exactly once")

    // ground truth: the naive batch inner range join (tiny corpus, the
    // quadratic shape is fine here — it is exactly what the operator's
    // bucketing replaces at scale)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), unix_micros(col("ts")).as("c_us"),
        round(col("value") * 100).cast("long").as("v"))
    val batchPairs = p.join(c,
        col("c_us") >= col("p_us") - 3600000000L && col("c_us") <= col("p_us"))
      .select("p_id", "c_id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchPairs.nonEmpty, "fixture must produce matches")
    assert(pairs.toSet == batchPairs,
      s"streaming-only: ${(pairs.toSet -- batchPairs).take(3)}; " +
        s"batch-only: ${(batchPairs -- pairs.toSet).take(3)}")

    // a run-2 purchase framed by a run-1 click can only match if the
    // click-side join state recovered from the checkpoint
    val tsMs = ev.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).toInstant.toEpochMilli).toMap
    val cutMs = cut.toInstant.toEpochMilli
    val crossRestart = pairs.filter { case (pid, cid, _) =>
      tsMs(pid) >= cutMs && tsMs(cid) < cutMs
    }
    assert(crossRestart.nonEmpty,
      "expected a pair spanning the restart (pre-restart click joined post-restart)")
  }

  test("stream-stream interval join equals the batch inner pairs across a kill/restart") {
    scenario(StreamingIntervalJoinSpec.emitted)
  }

  test("same recovery under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try scenario(StreamingIntervalJoinSpec.rocksEmitted)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Chained stateful operators: join → windowed aggregate. Three
    * AvailableNow runs over one checkpoint: the restart cut of
    * [[scenario]], then a watermark-pusher run (one far-future purchase
    * and one far-future click >1h apart, so they match nothing) that
    * closes every real purchase's window — after which the emitted rows
    * must equal the batch inner aggregate EXACTLY, each purchase once. */
  private def statsScenario(buf: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]): Unit = {
    val srcDir = Files.createTempDirectory("graft_ssa_src").toString
    val ckpt = Files.createTempDirectory("graft_ssa_ckpt").toString
    buf.clear()

    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val cut = java.sql.Timestamp.valueOf("2024-01-15 22:00:00")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingIntervalJoin.purchaseClickStats(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            buf.add((r.getLong(0), r.getLong(1), r.getDouble(2)))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(240000L), "streaming stats run timed out")
    }

    ev.filter(col("ts") < cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    ev.filter(col("ts") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    // watermark pusher: close every real window (72h and 74h past the
    // corpus, >1h apart so they never pair)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0).toInstant
    import spark.implicits._
    Seq((900001L, java.sql.Timestamp.from(maxTs.plusSeconds(72L * 3600)), "purchase", 0.0),
        (900002L, java.sql.Timestamp.from(maxTs.plusSeconds(74L * 3600)), "click", 0.0))
      .toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val got = buf.asScala.toSeq
    assert(got.map(_._1).distinct.size == got.size,
      "each purchase must finalize exactly once across the restarts")

    // ground truth: the batch INNER aggregate (clicked purchases only) —
    // same cents arithmetic as the operator
    val pfr = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
    val cfr = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("c_us"),
        round(col("value") * 100).cast("long").as("v"))
    val want = pfr.join(cfr,
        col("c_us") >= col("p_us") - 3600000000L && col("c_us") <= col("p_us"))
      .groupBy("p_id")
      .agg(count(lit(1)).as("n"), (sum(col("v")).cast("double") / 100.0).as("cv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty)
    assert(got.toSet == want,
      s"stream-only: ${(got.toSet -- want).take(3)}; batch-only: ${(want -- got.toSet).take(3)}")

    // the restart was load-bearing: at least one finalized purchase is
    // post-cut with a pre-cut click contributing
    val tsMs = ev.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).toInstant.toEpochMilli).toMap
    assert(got.exists { case (pid, _, _) => tsMs(pid) >= cut.toInstant.toEpochMilli },
      "expected post-restart purchases among the finalized groups")
  }

  test("chained join + windowed aggregate: batch output shape in-stream, exactly once across restarts") {
    statsScenario(StreamingIntervalJoinSpec.statsEmitted)
  }

  test("chained aggregate recovery under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try statsScenario(StreamingIntervalJoinSpec.rocksStatsEmitted)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("the plan is a bucket-partitioned symmetric hash join with derived state watermarks") {
    val srcDir = Files.createTempDirectory("graft_ssj_plan_src").toString
    Tables.events(spark, sf())
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val q = StreamingIntervalJoin.purchaseClickPairs(src)
      .writeStream
      // consume every partition: a no-op foreachBatch fails Spark 4's
      // state-store commit validation (no partition would ever commit)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ssj_plan_ckpt").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(240000L))
    val progress = q.recentProgress
    assert(progress.nonEmpty)
    // the stateful operator must be the symmetric hash join (both sides
    // buffered in the state store), not a stream-static or map-groups shape
    val ops = progress.flatMap(_.stateOperators.map(_.operatorName)).distinct
    assert(ops.contains("symmetricHashJoin"),
      s"expected the stream-stream join state operator, got: ${ops.mkString(", ")}")
    // watermark-derived cleanup is active: the join state does not retain
    // every input row forever (purchases 2x-exploded + clicks would far
    // exceed this bound if nothing evicted)
    val lastRows = progress.last.stateOperators.map(_.numRowsTotal).sum
    val inputs = progress.map(_.numInputRows).sum
    assert(lastRows < inputs,
      s"state ($lastRows rows) should be below total input ($inputs) after eviction")
  }
}

object StreamingIntervalJoinSpec {
  type Pair = (Long, Long, Long)
  val emitted: java.util.concurrent.ConcurrentLinkedQueue[Pair] =
    new java.util.concurrent.ConcurrentLinkedQueue[Pair]()
  val rocksEmitted: java.util.concurrent.ConcurrentLinkedQueue[Pair] =
    new java.util.concurrent.ConcurrentLinkedQueue[Pair]()
  val statsEmitted: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)] =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
  val rocksStatsEmitted: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)] =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
}
