package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{MetricsJdbcUpsert, PromRegistry}
import graft.streaming.StreamingMerge.MergeOut

/** Property pin for the JDBC delta fold: summing
  * [[MetricsJdbcUpsert.contributions]] over ANY stream of merge observe
  * events must agree, cell for cell, with the scrape registry
  * ([[PromRegistry]]) folding the same events — the two consumers of the
  * observation stream can never drift. 60 seeded cases × up to 250 random
  * events across all five emission kinds; pure JVM, no Spark session.
  *
  * Known representational difference (asserted, not papered over): the
  * scrape renders `_sum 0` / `_count 0` for the four unlabeled stats
  * histograms even before any observation, while the delta table only
  * materializes those cells on the first observation — absent row ≡ 0. */
class MetricsDeltaPropertySpec extends AnyFunSuite {

  private val lineRe = """^(\w+)(?:\{([^}]*)\})? (\S+)$""".r

  /** exposition → ((metric, sorted label map) → numeric value) */
  private def parseExpo(s: String): Map[(String, Map[String, String]), Double] =
    s.linesIterator.filterNot(l => l.startsWith("#") || l.isEmpty).map {
      case lineRe(name, labels, v) =>
        val lm = Option(labels).filter(_.nonEmpty).map(_.split(",").map { kv =>
          val Array(k, value) = kv.split("=", 2)
          k -> value.stripPrefix("\"").stripSuffix("\"")
        }.toMap).getOrElse(Map.empty[String, String])
        val value = if (v == "+Inf") Double.PositiveInfinity else v.toDouble
        (name, lm) -> value
      case other => fail(s"unparseable exposition line: $other")
    }.toMap

  /** delta key (metric, labels, le) → the exposition's (metric, label map),
    * translating the table's compact label forms to the scrape's names. */
  private def expoKey(metric: String, labels: String, le: String): (String, Map[String, String]) = {
    val lm = labels.split(",").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap
    val mapped =
      if (metric.startsWith("clickhouse_query_errors"))
        Map("stmt_type" -> lm("type"), "error_code" -> lm("code"))
      else if (metric.startsWith("clickhouse_query_"))
        lm.get("type").map(v => Map("stmt_type" -> v)).getOrElse(Map.empty[String, String])
      else lm
    (metric, mapped ++ (if (le.nonEmpty) Map("le" -> le) else Map.empty))
  }

  test("summed delta contributions equal the scrape registry for random observe streams") {
    val types = Seq("select", "insert", "update", "other")
    val counters = Seq("duplicated_initial_query", "convert", "not_found_query")
    for (case_ <- 0 until 60) {
      val rnd = new scala.util.Random(4200 + case_)
      def typ = types(rnd.nextInt(types.size))
      val events = Seq.fill(rnd.nextInt(250)) {
        rnd.nextInt(7) match {
          case 0 => MergeOut("counter", None, Some(counters(rnd.nextInt(counters.size))))
          case 1 => MergeOut("insert", None, None, stmtType = Some(typ))
          case 2 => MergeOut("query_error", None, None, stmtType = Some(typ),
            errorCode = Some(Seq(60L, 241L, 1000L)(rnd.nextInt(3))))
          case 3 => MergeOut("time_obs", None, None, stmtType = Some(typ),
            elapsedUs = Some(rnd.nextLong(30000000L)))
          case 4 => MergeOut("stats_obs", None, None,
            rowsRead = Some(rnd.nextLong(3000000000L)),
            bytesRead = Some(rnd.nextLong(1000000000L)),
            rps = Some(rnd.nextLong(200000000L)),
            speed = Some(rnd.nextLong(600000000L)))
          // the per-line delivery events of mergeWithDelivery — both
          // consumers must count them identically too
          case 5 => MergeOut("read_line", None, None)
          case _ => MergeOut("tail_line", None, None)
        }
      }

      val reg = new PromRegistry
      events.foreach(reg.observe)
      val expo = parseExpo(reg.render())

      // the summed delta, plus the same statics ensureTables seeds (zero
      // stats-bucket grid) and the read_lines scalar the listener owns
      val statics = Seq(("chlogexporter_read_lines", "", "", 0L)) ++ (for {
        (m, buckets) <- Seq(
          ("clickhouse_select_query_rows_read", graft.operators.PromMetrics.RowsReadBuckets),
          ("clickhouse_select_query_bytes_read", graft.operators.PromMetrics.BytesReadBuckets),
          ("clickhouse_select_query_rows_per_second", graft.operators.PromMetrics.RpsBuckets),
          ("clickhouse_select_query_bytes_per_second", graft.operators.PromMetrics.BpsBuckets))
        b <- buckets :+ Double.PositiveInfinity
      } yield (s"${m}_bucket", "", if (b.isPosInfinity) "+Inf"
        else if (b == b.floor) b.toLong.toString else b.toString, 0L))
      val delta = (events.flatMap(MetricsJdbcUpsert.contributions) ++ statics)
        .groupBy(t => (t._1, t._2, t._3))
        .view.mapValues(_.map(_._4).sum).toMap

      // 1) every delta cell matches the scrape, value for value (time_sum
      // stored in µs → scrape renders seconds)
      delta.foreach { case ((metric, labels, le), v) =>
        val key = expoKey(metric, labels, le)
        val expected = if (metric == "clickhouse_query_time_sum") v * 1e-6 else v.toDouble
        assert(expo.contains(key), s"case $case_: scrape lacks $key (delta $v)")
        assert(expo(key) == expected,
          s"case $case_: $key scrape=${expo(key)} delta=$expected")
      }
      // 2) every NONZERO scrape cell is present in the delta (zeros may be
      // representational: `_sum 0` rows exist only after first observation)
      val deltaKeys = delta.keySet.map { case (m, l, le) => expoKey(m, l, le) }
      expo.foreach { case (key, v) =>
        if (v != 0.0) assert(deltaKeys.contains(key),
          s"case $case_: nonzero scrape cell $key=$v missing from the delta")
      }
    }
  }
}
