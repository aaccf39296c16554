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
      // delivery events (StreamingMerge.mergeWithDelivery): the
      // exactly-once replacement for the observe()-listener side channel,
      // pre-aggregated per source partition (`n` lines each)
      case "read_line" => readLines += o.n
      case "tail_line" => tailLineErrors += o.n
      case _ => () // "record" — the data sink's concern, not the registry's
    }
  }

  import MetricsSink.fmtDouble
  import PromRegistry.Family

  /** Prometheus text exposition — byte-identical to
    * [[MetricsSink.exposition]] over the same corpus. */
  def render(): String = PromRegistry.assemble(families(PromRegistry.plainWrap))

  /** The metric families with every label set rendered through `wrap`
    * (which receives the inner label body — possibly empty — and returns
    * the braced rendering). The family list and per-family segment count
    * are FIXED regardless of content, which is what lets the fleet
    * renderer merge families position-by-position across per-server
    * registries ([[PromRegistry.renderMerged]]). */
  private[streaming] def families(wrap: String => String): Seq[Family] = synchronized {
    def counterFamily(name: String, help: String, lines: Seq[String]): Family =
      Family(name, help, "counter", Seq(lines.sorted))

    val readFam = Family("chlogexporter_read_lines", "Total read lines count",
      "counter", Seq(Seq(s"chlogexporter_read_lines${wrap("")} $readLines")))

    val errAll = errors.toMap ++
      (if (tailLineErrors > 0) Map("tail_line" -> tailLineErrors) else Map.empty)
    val errFam = counterFamily("chlogexporter_errors",
      "Clickhouse Log Exporter Internal Errors",
      errAll.toSeq.map { case (t, v) =>
        s"""chlogexporter_errors${wrap(s"""type="$t"""")} $v""" })
    val countFam = counterFamily("clickhouse_query_count",
      "Clickhouse Query Count by Type",
      queryCount.toSeq.map { case (t, v) =>
        s"""clickhouse_query_count${wrap(s"""stmt_type="$t"""")} $v""" })
    val qErrFam = counterFamily("clickhouse_query_errors",
      "Clickhouse Query Errors Count by Code",
      queryErrors.toSeq.map { case ((t, c), v) =>
        s"""clickhouse_query_errors${wrap(s"""stmt_type="$t",error_code="$c"""")} $v""" })

    // labeled time histogram: observed labels × full bucket grid, buckets in
    // (label, numeric le) order; _count/_sum lines sorted together
    val name = "clickhouse_query_time"
    val bucketLines = timeHists.toSeq.sortBy(_._1).flatMap { case (t, h) =>
      h.cumulative.map { case (le, c) =>
        s"""${name}_bucket${wrap(s"""stmt_type="$t",le="${fmtDouble(le)}"""")} $c"""
      }
    }
    val sumLines = timeHists.keys.toSeq.flatMap { t =>
      Seq(s"""${name}_sum${wrap(s"""stmt_type="$t"""")} ${fmtDouble(timeSumUs.getOrElse(t, 0L) * 1e-6)}""",
        s"""${name}_count${wrap(s"""stmt_type="$t"""")} ${timeHists(t).n}""")
    }.sorted
    val timeFam = Family(name, "Time needed to process query by type",
      "histogram", Seq(bucketLines, sumLines))

    def statFamily(name: String, help: String, h: Hist, sum: Long): Family =
      Family(name, help, "histogram", Seq(
        h.cumulative.map { case (le, c) =>
          s"""${name}_bucket${wrap(s"""le="${fmtDouble(le)}"""")} $c"""
        },
        Seq(s"${name}_sum${wrap("")} $sum"),
        Seq(s"${name}_count${wrap("")} ${h.n}")))

    Seq(readFam, errFam, countFam, qErrFam, timeFam,
      statFamily("clickhouse_select_query_rows_read", "Number of rows read by query",
        rowsHist, rowsSum),
      statFamily("clickhouse_select_query_bytes_read", "Bytes read by query",
        bytesHist, bytesSum),
      statFamily("clickhouse_select_query_rows_per_second", "Rows Per Second speed by query",
        rpsHist, rpsSum),
      statFamily("clickhouse_select_query_bytes_per_second", "Bytes Per Second speed by query",
        bpsHist, bpsSum))
  }
}

object PromRegistry {

  /** One metric family's rendering material: HELP/TYPE header plus
    * line segments (each segment joins with '\n' and terminates with
    * one '\n' — the segment boundaries reproduce the historical block
    * layout byte-for-byte). */
  private[streaming] final case class Family(name: String, help: String,
      typ: String, segments: Seq[Seq[String]])

  /** Label rendering of the single-registry scrape: no extra labels,
    * empty label sets render as no braces at all. */
  private[streaming] val plainWrap: String => String =
    body => if (body.isEmpty) "" else "{" + body + "}"

  /** Label rendering with a `server` label prepended to every series —
    * the fleet form. */
  private[streaming] def serverWrap(server: String): String => String = {
    val esc = server.replace("\\", "\\\\").replace("\"", "\\\"")
    body => s"""{server="$esc"""" + (if (body.isEmpty) "}" else "," + body + "}")
  }

  private[streaming] def assemble(fams: Seq[Family]): String = {
    val sb = new StringBuilder
    fams.foreach { f =>
      sb.append(s"# HELP ${f.name} ${f.help}\n# TYPE ${f.name} ${f.typ}\n")
      f.segments.foreach(seg => sb.append(seg.mkString("\n")).append("\n"))
    }
    sb.toString
  }

  /** Merge per-server registries into ONE exposition: each family's
    * HELP/TYPE appears once, its series enumerated per server (sorted by
    * server name) with the `server` label leading every label set —
    * valid Prometheus exposition for N servers through one endpoint
    * (repeating HELP per server would be an invalid exposition). */
  private[streaming] def renderMerged(regs: Seq[(String, PromRegistry)]): String = {
    val perServer = regs.sortBy(_._1).map { case (srv, reg) =>
      reg.families(serverWrap(srv))
    }
    if (perServer.isEmpty) return assemble(new PromRegistry().families(plainWrap))
    val merged = perServer.transpose.map { fams =>
      Family(fams.head.name, fams.head.help, fams.head.typ,
        fams.head.segments.indices.map(i => fams.flatMap(_.segments(i))))
    }
    assemble(merged)
  }
}

/** Per-server scrape registry for the FLEET exporter: one [[PromRegistry]]
  * per tailed log, folded from the fleet merge's server-tagged emissions,
  * rendered as one merged exposition with a `server` label on every
  * series. [[seed]] the configured paths up front so every server's
  * zero-state series are scrapeable before its first line arrives. */
final class FleetPromRegistry {
  private val regs = scala.collection.concurrent.TrieMap.empty[String, PromRegistry]

  def seed(server: String): Unit = { regs.getOrElseUpdate(server, new PromRegistry); () }

  def observe(o: MergeOut): Unit =
    regs.getOrElseUpdate(o.server.getOrElse(""), new PromRegistry).observe(o)

  def render(): String = PromRegistry.renderMerged(regs.toSeq)
}
