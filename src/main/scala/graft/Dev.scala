package graft

import org.apache.spark.sql.SparkSession
import graft.operators._

/** Scratch dev runner (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val lines = LogRender.lines(events)
    println(s"lines: ${lines.count()}")
    lines.orderBy("seq").show(6, false)

    val parsed = LogParser.parse(lines)
    parsed.cache()
    println("kinds:")
    parsed.groupBy("kind", "cv_ok").count().orderBy("kind").show()

    val merged = QueryMerge.merged(parsed)
    println(s"merged: ${merged.count()}")
    merged.orderBy("id").show(5, false)

    println("error counters:")
    QueryMerge.errorCounters(parsed).show()
    println("query count:")
    PromMetrics.queryCount(parsed).show()
    println("query time hist:")
    PromMetrics.queryTimeHistogram(parsed).orderBy("stmt_type", "le").show(100)
    spark.stop()
  }
}
