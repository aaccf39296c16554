package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's testdata tables (TESTDATA.md). */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive `events` loader. The driver's testdata has shipped
    * `ts` in two physical encodings across rounds:
    *
    *  - nanosecond-precision parquet, which Spark 4 only reads with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (→ `LongType` of raw
    *    nanos): truncate ns→µs, the same floor DuckDB's
    *    `CAST(ts AS TIMESTAMP)` applies;
    *  - tz-naive `timestamp[us]` (→ `TIMESTAMP_NTZ`): cast to session-tz
    *    `TimestampType`. The box and oracle both run UTC, so this yields
    *    the identical epoch-micros values the ns path produced and keeps
    *    every downstream consumer (and the driver's hash compare) on one
    *    stable `timestamp` schema.
    *
    * Branching on the LOADED schema (not a config flag) means a future
    * re-encode of the testdata fails with one clear IllegalStateException
    * here instead of 25 downstream analysis errors (the r5 failure mode).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // raw nanos (legacy testdata + nanosAsLong=true)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected int64 nanos, " +
            "timestamp, or timestamp_ntz")
    }
  }

  /** Spread a small-file scan across the cluster before per-row-heavy work
    * (regex parse, shingling, quantization). The testdata tables are single
    * parquet files well under `maxPartitionBytes`, so without this every
    * downstream map stage runs on ONE task; at 100 TB the scan itself
    * provides the parallelism and this is a no-op by construction. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
