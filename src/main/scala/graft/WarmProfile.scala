package graft

import org.apache.spark.sql.SparkSession

/** Dev-only warm-stage profiler: runs SparkEntry.warmCaches under the Bench
  * session config with `GRAFT_WARM_SEQUENTIAL=1` (chains and branches run
  * one at a time), so each `[warm]` stage line reports the stage's own
  * compute instead of its share of a saturated core pool. Used to pick
  * optimization targets inside cache_build. Not part of the driver
  * contract. */
object WarmProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    SparkEntry.warmCaches(spark, sfDir)
    println(f"[seqwarm] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
