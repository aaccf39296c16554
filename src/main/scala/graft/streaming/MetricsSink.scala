package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.{PromMetrics, QueryMerge}

/** The pull-based metrics sink (SURVEY §2.1 S4): the reference serves
  * `GET /metrics` from an in-process Prometheus registry
  * (main.go:55-68, metrics.go:72-75). Spark-natively, the metric
  * aggregation DataFrames ARE the registry — this object renders them in
  * the Prometheus text exposition format (counters as monotonic totals,
  * histograms as cumulative `{le}` series + `_sum` + `_count`).
  *
  * Batch: call [[exposition]] on a parsed-event frame. Streaming: call it
  * inside `writeStream.foreachBatch` on each micro-batch's accumulated
  * state (or on the batch view of the completed-record table) and serve the
  * string from any HTTP endpoint — the driver-side exposition is a few KB
  * regardless of input scale because every aggregation reduces before
  * collect.
  */
object MetricsSink {

  private def fmtDouble(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else if (d.isPosInfinity) "+Inf"
    else d.toString

  private def counterLines(name: String, help: String, df: DataFrame,
      labelCols: Seq[String], valueCol: String): String = {
    val rows = df.collect().toSeq
    val body = rows.map { r =>
      val labels =
        if (labelCols.isEmpty) ""
        else labelCols.map(c => s"""$c="${r.getAs[Any](c)}"""").mkString("{", ",", "}")
      s"$name$labels ${r.getAs[Long](valueCol)}"
    }.sorted.mkString("\n")
    s"# HELP $name $help\n# TYPE $name counter\n$body\n"
  }

  private def histogramLines(name: String, help: String, hist: DataFrame,
      sumCount: DataFrame, labelCols: Seq[String], sumScale: Double): String = {
    val bucketRows = hist.collect().toSeq
    def labelStr(r: Row, extra: Seq[(String, String)]): String = {
      val ls = labelCols.map(c => s"""$c="${r.getAs[Any](c)}"""") ++
        extra.map { case (k, v) => s"""$k="$v"""" }
      if (ls.isEmpty) "" else ls.mkString("{", ",", "}")
    }
    val buckets = bucketRows.map { r =>
      val le = fmtDouble(r.getAs[Double]("le"))
      s"${name}_bucket${labelStr(r, Seq("le" -> le))} ${r.getAs[Long]("cum_count")}"
    }.sorted.mkString("\n")
    val sums = sumCount.collect().toSeq.flatMap { r =>
      Seq(
        s"${name}_sum${labelStr(r, Nil)} ${fmtDouble(r.getAs[Long]("sum") * sumScale)}",
        s"${name}_count${labelStr(r, Nil)} ${r.getAs[Long]("count")}")
    }.sorted.mkString("\n")
    s"# HELP $name $help\n# TYPE $name histogram\n$buckets\n$sums\n"
  }

  /** Render the reference's full metric surface (A2-A9 + read_lines
    * supplied separately) from a parsed-event frame. */
  def exposition(parsed: DataFrame, readLines: Long): String = {
    val sb = new StringBuilder
    sb.append("# HELP chlogexporter_read_lines Total read lines count\n")
    sb.append("# TYPE chlogexporter_read_lines counter\n")
    sb.append(s"chlogexporter_read_lines $readLines\n")

    sb.append(counterLines("chlogexporter_errors",
      "Clickhouse Log Exporter Internal Errors",
      QueryMerge.errorCounters(parsed), Seq("type"), "count"))

    sb.append(counterLines("clickhouse_query_count",
      "Clickhouse Query Count by Type",
      PromMetrics.queryCount(parsed), Seq("stmt_type"), "count"))

    sb.append(counterLines("clickhouse_query_errors",
      "Clickhouse Query Errors Count by Code",
      PromMetrics.queryErrors(parsed), Seq("stmt_type", "error_code"), "count"))

    sb.append(histogramLines("clickhouse_query_time",
      "Time needed to process query by type",
      PromMetrics.queryTimeHistogram(parsed),
      PromMetrics.queryTimeSumCount(parsed), Seq("stmt_type"), 1e-6))

    val stats = PromMetrics.statsSumCounts(parsed).collect().head
    def statHist(name: String, help: String, hist: DataFrame, sumCol: String): Unit = {
      val buckets = hist.collect().toSeq.map { r =>
        name + "_bucket{le=\"" + fmtDouble(r.getAs[Double]("le")) + "\"} " +
          r.getAs[Long]("cum_count")
      }.sorted.mkString("\n")
      sb.append(s"# HELP $name $help\n# TYPE $name histogram\n$buckets\n")
      sb.append(s"${name}_sum ${stats.getAs[Long](sumCol)}\n")
      sb.append(s"${name}_count ${stats.getAs[Long]("count")}\n")
    }
    statHist("clickhouse_select_query_rows_read", "Number of rows read by query",
      PromMetrics.rowsReadHistogram(parsed), "rows_read_sum")
    statHist("clickhouse_select_query_bytes_read", "Bytes read by query",
      PromMetrics.bytesReadHistogram(parsed), "bytes_read_sum")
    statHist("clickhouse_select_query_rows_per_second", "Rows Per Second speed by query",
      PromMetrics.rpsHistogram(parsed), "rps_sum")
    statHist("clickhouse_select_query_bytes_per_second", "Bytes Per Second speed by query",
      PromMetrics.bpsHistogram(parsed), "speed_sum")
    sb.toString
  }
}
