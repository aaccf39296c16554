package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-query timer: `runMain graft.TimeQ <query>...` runs the named
  * [[SparkEntry.queries]] entries in order against SPARK_GRAFT_SF_DIR
  * (default sf0.1) under the Bench session config and prints wall time per
  * query — repeat a name to separate cache-build cost from warm cost. Not
  * part of the driver contract. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
