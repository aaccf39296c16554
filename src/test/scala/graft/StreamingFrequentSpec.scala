package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Tables
import graft.streaming.StreamingFrequent

/** The sixth events-analytics streaming twin: the threshold-crossing
  * frequent-user detector must emit exactly the batch heavy-hitter
  * query's `confirmed` set — each user once, across a checkpointed
  * kill/restart, under both state-store providers. */
class StreamingFrequentSpec extends SparkSpec {

  private val support = 40L // sf0.001: ~67-event mean, plenty of crossings

  private def addFile(df: org.apache.spark.sql.DataFrame, srcDir: String, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_freq_half").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(srcDir, name))
    ()
  }

  private def scenario(): Unit = {
    val events = Tables.events(spark, sf()).select(col("event_id"), col("user_id"))
    val ids = events.select("event_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    val srcDir = Files.createTempDirectory("graft_freq_src").toString
    val ckpt = Files.createTempDirectory("graft_freq_ckpt").toString
    val sunk = StreamingFrequentSpec.sunk
    sunk.clear()

    def runOnce(): Unit = {
      val in = spark.readStream.schema(events.schema).parquet(srcDir)
      val q: StreamingQuery = StreamingFrequent.frequentUsers(in, support)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingFrequent.Crossing], _: Long) =>
          batch.collect().foreach(c => StreamingFrequentSpec.sunk.add(
            (c.user_id, c.count_at_crossing)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
    }

    addFile(events.filter(col("event_id") < mid), srcDir, "h1.parquet")
    runOnce()
    import scala.jdk.CollectionConverters._
    val afterH1 = sunk.asScala.toSeq
    assert(afterH1.map(_._1).distinct.size == afterH1.size, "one emission per user")

    // restart: the per-user running counts resume from the state store —
    // users already past the threshold must NOT re-emit, users whose
    // crossing spans the restart must emit exactly once
    addFile(events.filter(col("event_id") >= mid), srcDir, "h2.parquet")
    runOnce()
    val all = sunk.asScala.toSeq
    assert(all.map(_._1).distinct.size == all.size,
      s"duplicate emission across the restart: $all")
    all.foreach { case (u, c) => assert(c >= support, s"user $u emitted at $c") }

    // ≡ the batch heavy-hitter query's confirmed set over the full corpus
    val confirmed = RelationalQueries.heavyHitters(spark, sf(), minSupport = support)
      .filter(col("confirmed")).select("user_id")
      .collect().map(_.getLong(0)).toSet
    assert(all.map(_._1).toSet == confirmed,
      s"streamed ${all.map(_._1).toSet} vs batch $confirmed")
    assert(confirmed.nonEmpty)
  }

  test("threshold crossings equal the batch CMS query's confirmed set across a restart") {
    scenario()
  }

  test("same detector under the RocksDB state store provider (the 100x-scale store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try scenario()
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** TTL semantics pin (watermark-driven, deterministic): a user idle past
    * the event-time horizon is EVICTED; when they return, the count
    * restarts and a re-crossing RE-EMITS. */
  private def ttlScenario(): Unit = {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_freq_ttl_src").toString
    val ckpt = Files.createTempDirectory("graft_freq_ttl_ckpt").toString
    val sunk = StreamingFrequentSpec.sunk
    sunk.clear()
    // offset well past epoch 0: the initial watermark IS 0, and events at
    // the watermark boundary are dropped as late before the stateful op
    def ts(s: Long) = new java.sql.Timestamp((100000L + s) * 1000L)
    val schema = Seq((0L, ts(0))).toDF("user_id", "ts").schema

    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingFrequent
        .frequentUsersTtl(in, minSupport = 3L, ttlMs = 10000L)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingFrequent.Crossing], _: Long) =>
          batch.collect().foreach(c => StreamingFrequentSpec.sunk.add(
            (c.user_id, c.count_at_crossing)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
    }
    import scala.jdk.CollectionConverters._

    // b1: user 1 crosses at t=0s; their eviction deadline becomes t=10s
    addFile(Seq((1L, ts(0)), (1L, ts(0)), (1L, ts(0))).toDF("user_id", "ts"),
      srcDir, "b1.parquet")
    runOnce()
    assert(sunk.asScala.toSeq == Seq((1L, 3L)))

    // b2 advances the watermark to 30s (past user 1's deadline)…
    addFile(Seq((2L, ts(30)), (2L, ts(30)), (2L, ts(30))).toDF("user_id", "ts"),
      srcDir, "b2.parquet")
    runOnce()
    assert(sunk.asScala.toSeq == Seq((1L, 3L), (2L, 3L)))

    // …so the NEXT batch evicts user 1 (timeouts fire once the watermark
    // passes the deadline); user 2 stays under their refreshed deadline
    addFile(Seq((2L, ts(31))).toDF("user_id", "ts"), srcDir, "b3.parquet")
    runOnce()
    assert(sunk.asScala.toSeq == Seq((1L, 3L), (2L, 3L)), "no emission on eviction")

    // user 1 returns: count restarted from zero, crossing RE-EMITS —
    // "frequent within one activity span", the documented TTL semantics
    addFile(Seq((1L, ts(32)), (1L, ts(32)), (1L, ts(32))).toDF("user_id", "ts"),
      srcDir, "b4.parquet")
    runOnce()
    assert(sunk.asScala.toSeq == Seq((1L, 3L), (2L, 3L), (1L, 3L)),
      s"an evicted user's re-crossing must re-emit: ${sunk.asScala.toSeq}")

    // control: user 2 was NEVER evicted (events at 30s and 31s kept the
    // deadline sliding), so their count at 32s is 4 — no re-emission
    addFile(Seq((2L, ts(32))).toDF("user_id", "ts"), srcDir, "b5.parquet")
    runOnce()
    assert(sunk.asScala.toSeq.size == 3, "a live user never re-emits")
  }

  test("TTL variant: eviction past the event-time horizon, re-crossing re-emits") {
    ttlScenario()
  }

  test("same TTL semantics under the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try ttlScenario()
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object StreamingFrequentSpec {
  /** Cross-restart sink buffer (foreachBatch closures need driver-shared state). */
  val sunk: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)] =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
}
