package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.operators.Tables

/** The schema-adaptive events loader (r6: the driver's testdata flipped
  * `ts` from ns-int64 to naive timestamp[us] between rounds and took out
  * 25 registry rows). All three accepted encodings must normalize to the
  * IDENTICAL session-tz timestamps — including the legacy ns branch,
  * which current testdata no longer exercises and would otherwise rot
  * unproven — and anything else must fail at the loader with one clear
  * error, not 25 analysis errors downstream. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // three instants with sub-second precision, expressed as epoch micros
  private val micros = Seq(1709293496789012L, 1709293496789013L, 1709380000000000L)

  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft_tables").toString
    df.coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("ns-int64, timestamp, and timestamp_ntz encodings load to identical timestamps") {
    val base = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")

    val nsDir = writeEvents(base.select(col("event_id"), (col("us") * 1000L).as("ts")))
    val tsDir = writeEvents(base.select(col("event_id"),
      timestamp_micros(col("us")).as("ts")))
    val ntzDir = writeEvents(base.select(col("event_id"),
      timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))

    val loaded = Seq(nsDir, tsDir, ntzDir).map { d =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType,
        s"every branch must normalize to session-tz timestamp, got ${df.schema("ts").dataType}")
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(loaded(0) == micros.zipWithIndex.map { case (us, i) => (i.toLong, us) },
      "ns branch must truncate nanos to the exact micros")
    assert(loaded.distinct.size == 1,
      s"all three encodings must agree: ${loaded.map(_.take(2))}")
  }

  test("REAL parquet timestamp[ns] data decodes through the legacy branch (the full contract)") {
    // the synthetic LongType test above pins the branch ARITHMETIC; this
    // fixture (written by pyarrow with ts: timestamp[ns]) pins the DECODE
    // contract too — that nanosAsLong=true surfaces parquet TIMESTAMP(NANOS)
    // as LongType at all. If a Spark upgrade drops the legacy flag, THIS
    // fails at the loader instead of real ns testdata failing in 25 places.
    val df = Tables.events(spark, "src/test/resources/fixtures/events_ns")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // nanos 1709293496789012123 / 789013987 / ...001 truncate to micros
    assert(got == Seq((0L, 1709293496789012L), (1L, 1709293496789013L),
      (2L, 1709380000000000L)))
  }

  test("an unsupported ts encoding fails at the loader with one clear error") {
    val dir = writeEvents(Seq((1L, "2024-03-01")).toDF("event_id", "ts"))
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported"))
  }
}
