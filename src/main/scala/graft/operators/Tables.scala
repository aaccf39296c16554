package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's testdata tables (TESTDATA.md). */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is nanosecond-precision parquet, which Spark 4 refuses to
    * read as a timestamp. Read it as raw nanos (legacy conf, runtime-settable)
    * and truncate to microseconds — the same ns→µs floor DuckDB's
    * `CAST(ts AS TIMESTAMP)` applies, keeping oracle hashes aligned
    * (TESTDATA/FIXTURES timestamp note).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
