package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's testdata tables (TESTDATA.md). */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is nanosecond-precision parquet, which Spark 4 refuses to
    * read as a timestamp. Read it as raw nanos and truncate to microseconds —
    * the same ns→µs floor DuckDB's `CAST(ts AS TIMESTAMP)` applies, keeping
    * oracle hashes aligned (TESTDATA/FIXTURES timestamp note).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set at session
    * creation by every entry point (Verify/Bench/Dev/SparkSpec builders) —
    * deliberately NOT mutated here: a query loader flipping session-wide SQL
    * conf as a side effect would change how unrelated ns-parquet reads parse
    * and race with concurrent plan construction.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session creation " +
        "(events.parquet carries nanosecond timestamps)")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Spread a small-file scan across the cluster before per-row-heavy work
    * (regex parse, shingling, quantization). The testdata tables are single
    * parquet files well under `maxPartitionBytes`, so without this every
    * downstream map stage runs on ONE task; at 100 TB the scan itself
    * provides the parallelism and this is a no-op by construction. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
