package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.ChQuery
import graft.operators.{LogParser, LogRender, QueryMerge, Tables}
import graft.streaming.StreamingMerge

/** Batch ≡ streaming equivalence on the driver's rendered log corpus
  * (VERDICT r1 item 6): the oracle-checked batch merge and the
  * `flatMapGroupsWithState` streaming merge must produce the same completed
  * records and the same error-counter totals for the same corpus — the
  * streaming path's bridge into the DuckDB-oracle loop.
  */
class StreamingEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  /** Render the sf0.001 events corpus to a log file on disk, return
    * (file dir, the exact (seq, value) frame batch-parses). */
  private def renderCorpus(): (String, org.apache.spark.sql.DataFrame) = {
    val lines = LogRender.lines(Tables.events(spark, sf()))
    val ordered = lines.orderBy("seq").select("value").as[String].collect()
    val dir = Files.createTempDirectory("graft_equiv").toFile
    Files.write(new java.io.File(dir, "clickhouse-server.log").toPath,
      ordered.mkString("", "\n", "\n").getBytes)
    (dir.getAbsolutePath, lines)
  }

  test("streaming merge equals the oracle-checked batch merge on the rendered corpus") {
    val (dir, lines) = renderCorpus()

    // batch side: the oracle-checked merged table, completed records only
    // (with NoTimeout the streaming side emits exactly the completed ones)
    val batch = QueryMerge.merged(LogParser.parse(lines))
      .filter(col("full_info"))
      .select("id", "query", "port", "pid", "rows_read", "bytes_read",
        "elapsed", "rps", "speed", "memory", "error", "error_code",
        "error_message", "stmt_type", "host")
      .as[(String, String, Long, Long, Long, Long, Double, Long, Long, Long,
        Boolean, Long, String, String, String)]
      .collect().toSet

    // streaming side: AvailableNow over the file, NoTimeout (armed
    // processing-time timeouts never drain under AvailableNow)
    val out = StreamingMerge.filePipeline(spark, dir, timeoutMs = 0L)
    val qname = s"equiv_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(240000L)

    val streaming = spark.table(qname).as[ChQuery].collect()
      .map(r => (r.id, r.query, r.port, r.pid, r.rowsRead, r.bytesRead,
        r.elapsed, r.rps, r.speed, r.memory, r.error, r.errorCode,
        r.errorMessage, r.stmtType, r.host)).toSet

    assert(streaming.nonEmpty, "corpus must produce completed records")
    assert(streaming == batch,
      s"streaming-only: ${(streaming -- batch).take(3)}; batch-only: ${(batch -- streaming).take(3)}")
  }

  test("streaming error-counter totals equal the oracle-checked batch counters") {
    val (dir, lines) = renderCorpus()

    val batchCounters = QueryMerge.errorCounters(LogParser.parse(lines))
      .as[(String, Long)].collect().toMap

    val counts = StreamingEquivalenceSpec.counters
    counts.clear()
    val parsed = StreamingMerge.toLogEvents(LogParser.parse(
      StreamingMerge.seqAssign(spark.readStream.text(dir).as[String])))
    val q = StreamingMerge.mergeWithMetrics(parsed, timeoutMs = 0L)
      .filter(_.out == "counter")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingMerge.MergeOut], _: Long) =>
        batch.collect().foreach(_.counterType.foreach(t =>
          StreamingEquivalenceSpec.counters.merge(t, 1L, (a, b) => Long.box(a + b))))
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_equiv_ckpt").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(240000L)

    val streamingCounters = counts.asScala.map { case (k, v) => k -> Long.unbox(v) }.toMap
    assert(streamingCounters.nonEmpty)
    assert(streamingCounters == batchCounters,
      s"streaming=$streamingCounters batch=$batchCounters")
  }

  test("re-used ids: batch lifecycle merge equals the streaming merge") {
    val dt1 = "2024.03.01 12:00:01.000000"
    val dt2 = "2024.03.01 12:00:02.000000"
    val dt3 = "2024.03.01 12:00:03.000000"
    val dt4 = "2024.03.01 12:00:05.500000"
    val lines = Seq(
      s"$dt1 [ 7 ] {ru} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1",
      s"$dt1 [ 7 ] {ru} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec.",
      s"$dt2 [ 7 ] {ru} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB.",
      s"$dt3 [ 7 ] {ru} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 2",
      s"$dt3 [ 7 ] {ru} <Error> executeQuery: Code: 60, e.displayText() = DB::Exception: boom",
      s"$dt4 [ 7 ] {ru} <Debug> MemoryTracker: Peak memory usage (for query): 5 MiB.")
    val dir = Files.createTempDirectory("graft_reuse").toFile
    Files.write(new java.io.File(dir, "reuse.log").toPath,
      lines.mkString("", "\n", "\n").getBytes)

    val batchParsed = LogParser.parse(
      lines.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("seq", "value"))
    val batch = QueryMerge.merged(batchParsed).filter(col("full_info"))
      .select("query", "rows_read", "memory", "elapsed", "error", "error_code")
      .as[(String, Long, Long, Double, Boolean, Long)].collect().toSet

    val out = StreamingMerge.filePipeline(spark, dir.getAbsolutePath, timeoutMs = 0L)
    val qname = s"reuse_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(240000L)
    val streaming = spark.table(qname).as[ChQuery].collect()
      .map(r => (r.query, r.rowsRead, r.memory, r.elapsed, r.error, r.errorCode)).toSet

    assert(batch.size == 2, s"two lifecycles expected, got $batch")
    assert(streaming == batch,
      s"streaming-only: ${streaming -- batch}; batch-only: ${batch -- streaming}")
  }

  test("counters are exactly-once across a checkpointed kill/restart mid-corpus") {
    val srcDir = Files.createTempDirectory("graft_cnt_src").toFile
    val ckpt = Files.createTempDirectory("graft_cnt_ckpt").toString
    val counts = StreamingEquivalenceSpec.recovered
    counts.clear()

    val dt = "2024.03.01 12:00:01.000000"
    def initial(id: String) =
      s"$dt [ 7 ] {$id} <Debug> executeQuery: (from 10.0.0.9:9000) SELECT 1"
    def stats(id: String) =
      s"$dt [ 7 ] {$id} <Information> executeQuery: Read 500 rows, 2 KiB in 0.100 sec., 5000 rows/sec., 20 KiB/sec."
    def memory(id: String) =
      s"2024.03.01 12:00:02.000000 [ 7 ] {$id} <Debug> MemoryTracker: Peak memory usage (for query): 3 MiB."

    def runOnce(): Unit = {
      val parsed = StreamingMerge.toLogEvents(LogParser.parse(
        StreamingMerge.seqAssign(spark.readStream.text(srcDir.getAbsolutePath).as[String])))
      val q = StreamingMerge.mergeWithMetrics(parsed, timeoutMs = 0L)
        .filter(_.out == "counter")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingMerge.MergeOut], _: Long) =>
          batch.collect().foreach(_.counterType.foreach(t =>
            StreamingEquivalenceSpec.recovered.merge(t, 1L, (a, b) => Long.box(a + b))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(240000L)
    }

    // run 1: orphan stats (not_found) + initial + duplicate initial
    Files.write(new java.io.File(srcDir, "f1.log").toPath,
      Seq(stats("ghost"), initial("r1"), initial("r1")).mkString("", "\n", "\n").getBytes)
    runOnce() // query stops (AvailableNow) = the "kill" point; state + commits in ckpt

    // run 2 (restart from checkpoint): completion + post-eviction orphan
    Files.write(new java.io.File(srcDir, "f2.log").toPath,
      Seq(memory("r1"), stats("r1")).mkString("", "\n", "\n").getBytes)
    runOnce()

    val totals = counts.asScala.map { case (k, v) => k -> Long.unbox(v) }.toMap
    // exactly-once: ghost orphan 1, dup 1 (NOT replayed by run 2), post-eviction orphan 1
    assert(totals == Map("not_found_query" -> 2L, "duplicated_initial_query" -> 1L), totals.toString)
  }
}

object StreamingEquivalenceSpec {
  val counters: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long] =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  val recovered: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long] =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
}
