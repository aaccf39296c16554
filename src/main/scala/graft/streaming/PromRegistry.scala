package graft.streaming

import scala.collection.mutable

import graft.operators.PromMetrics
import graft.streaming.StreamingMerge.MergeOut

/** Driver-side INCREMENTAL metric registry — the reference's actual model
  * (metrics.go:72-75: an in-process registry mutated per event, read by the
  * scrape handler), re-created for the streaming engine: each micro-batch
  * folds the merge's observation events ([[StreamingMerge.MergeOut]], one
  * per reference observe site) into running counters/bucket arrays, so
  * serving cost is O(batch), not O(corpus-so-far).
  *
  * [[render]] reproduces [[MetricsSink.exposition]] BYTE-FOR-BYTE for the
  * same corpus (asserted by spec) — the incremental and re-aggregating
  * paths are interchangeable scrape surfaces.
  *
  * Like the reference's registry, state is in-memory and volatile: a
  * restart starts from zero (durable counters would re-fold from the
  * checkpointed merge state — out of scope, as in the reference).
  * Thread-safety: all mutators and render synchronize on this (scrape
  * handler vs micro-batch thread).
  */
final class PromRegistry {

  private var readLines: Long = 0L
  private var tailLineErrors: Long = 0L
  private val errors = mutable.Map.empty[String, Long]
  private val queryCount = mutable.Map.empty[String, Long]
  private val queryErrors = mutable.Map.empty[(String, Long), Long]

  private final class Hist(buckets: Seq[Double]) {
    val bounds: Array[Double] = buckets.toArray
    val counts: Array[Long] = new Array[Long](buckets.size + 1) // + Inf slot
    var n: Long = 0L
    def observe(v: Double): Unit = {
      var i = 0
      while (i < bounds.length && v > bounds(i)) i += 1
      counts(i) += 1
      n += 1
    }
    def cumulative: Seq[(Double, Long)] = {
      var acc = 0L
      (bounds :+ Double.PositiveInfinity).toSeq.zipWithIndex.map { case (le, i) =>
        acc += counts(i); (le, acc)
      }
    }
  }

  private val timeHists = mutable.Map.empty[String, Hist] // stmt_type -> hist
  private val timeSumUs = mutable.Map.empty[String, Long]
  private val rowsHist = new Hist(PromMetrics.RowsReadBuckets)
  private val bytesHist = new Hist(PromMetrics.BytesReadBuckets)
  private val rpsHist = new Hist(PromMetrics.RpsBuckets)
  private val bpsHist = new Hist(PromMetrics.BpsBuckets)
  private var rowsSum, bytesSum, rpsSum, bpsSum, statsN = 0L

  def addReadLines(n: Long): Unit = synchronized { readLines += n }
  def addTailLineErrors(n: Long): Unit = synchronized { tailLineErrors += n }

  /** Fold one merge emission (counter or observation) into the registry. */
  def observe(o: MergeOut): Unit = synchronized {
    o.out match {
      case "counter" =>
        o.counterType.foreach(t => errors(t) = errors.getOrElse(t, 0L) + 1)
      case "insert" =>
        o.stmtType.foreach(t => queryCount(t) = queryCount.getOrElse(t, 0L) + 1)
      case "query_error" =>
        for (t <- o.stmtType; c <- o.errorCode)
          queryErrors((t, c)) = queryErrors.getOrElse((t, c), 0L) + 1
      case "time_obs" =>
        for (t <- o.stmtType; us <- o.elapsedUs) {
          timeHists.getOrElseUpdate(t, new Hist(PromMetrics.QueryTimeBuckets))
            .observe(us / 1000000.0)
          timeSumUs(t) = timeSumUs.getOrElse(t, 0L) + us
        }
      case "stats_obs" =>
        rowsHist.observe(o.rowsRead.getOrElse(0L).toDouble)
        bytesHist.observe(o.bytesRead.getOrElse(0L).toDouble)
        rpsHist.observe(o.rps.getOrElse(0L).toDouble)
        bpsHist.observe(o.speed.getOrElse(0L).toDouble)
        rowsSum += o.rowsRead.getOrElse(0L)
        bytesSum += o.bytesRead.getOrElse(0L)
        rpsSum += o.rps.getOrElse(0L)
        bpsSum += o.speed.getOrElse(0L)
        statsN += 1
      // per-line delivery events (StreamingMerge.mergeWithDelivery): the
      // exactly-once replacement for the observe()-listener side channel
      case "read_line" => readLines += 1
      case "tail_line" => tailLineErrors += 1
      case _ => () // "record" — the data sink's concern, not the registry's
    }
  }

  import MetricsSink.fmtDouble

  /** Prometheus text exposition — byte-identical to
    * [[MetricsSink.exposition]] over the same corpus. */
  def render(): String = synchronized {
    val sb = new StringBuilder
    sb.append("# HELP chlogexporter_read_lines Total read lines count\n")
    sb.append("# TYPE chlogexporter_read_lines counter\n")
    sb.append(s"chlogexporter_read_lines $readLines\n")

    def counterBlock(name: String, help: String, lines: Seq[String]): Unit =
      sb.append(s"# HELP $name $help\n# TYPE $name counter\n")
        .append(lines.sorted.mkString("\n")).append("\n")

    val errAll = errors.toMap ++
      (if (tailLineErrors > 0) Map("tail_line" -> tailLineErrors) else Map.empty)
    counterBlock("chlogexporter_errors", "Clickhouse Log Exporter Internal Errors",
      errAll.toSeq.map { case (t, v) => s"""chlogexporter_errors{type="$t"} $v""" })
    counterBlock("clickhouse_query_count", "Clickhouse Query Count by Type",
      queryCount.toSeq.map { case (t, v) => s"""clickhouse_query_count{stmt_type="$t"} $v""" })
    counterBlock("clickhouse_query_errors", "Clickhouse Query Errors Count by Code",
      queryErrors.toSeq.map { case ((t, c), v) =>
        s"""clickhouse_query_errors{stmt_type="$t",error_code="$c"} $v""" })

    // labeled time histogram: observed labels × full bucket grid, buckets in
    // (label, numeric le) order; _count/_sum lines sorted together
    val name = "clickhouse_query_time"
    sb.append(s"# HELP $name Time needed to process query by type\n# TYPE $name histogram\n")
    val bucketLines = timeHists.toSeq.sortBy(_._1).flatMap { case (t, h) =>
      h.cumulative.map { case (le, c) =>
        s"""${name}_bucket{stmt_type="$t",le="${fmtDouble(le)}"} $c"""
      }
    }
    sb.append(bucketLines.mkString("\n")).append("\n")
    val sumLines = timeHists.keys.toSeq.flatMap { t =>
      Seq(s"""${name}_sum{stmt_type="$t"} ${fmtDouble(timeSumUs.getOrElse(t, 0L) * 1e-6)}""",
        s"""${name}_count{stmt_type="$t"} ${timeHists(t).n}""")
    }
    sb.append(sumLines.sorted.mkString("\n")).append("\n")

    def statBlock(name: String, help: String, h: Hist, sum: Long): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name histogram\n")
      sb.append(h.cumulative.map { case (le, c) =>
        s"""${name}_bucket{le="${fmtDouble(le)}"} $c"""
      }.mkString("\n")).append("\n")
      sb.append(s"${name}_sum $sum\n")
      sb.append(s"${name}_count ${h.n}\n")
    }
    statBlock("clickhouse_select_query_rows_read", "Number of rows read by query",
      rowsHist, rowsSum)
    statBlock("clickhouse_select_query_bytes_read", "Bytes read by query",
      bytesHist, bytesSum)
    statBlock("clickhouse_select_query_rows_per_second", "Rows Per Second speed by query",
      rpsHist, rpsSum)
    statBlock("clickhouse_select_query_bytes_per_second", "Bytes Per Second speed by query",
      bpsHist, bpsSum)
    sb.toString
  }
}
