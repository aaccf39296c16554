package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MetricsJdbcAppend

/** Property pin for append-table compaction: under ANY interleaving of
  * applied batches, compactions, and replay attempts, the fold view always
  * equals the running sum of every batch applied exactly once, and every
  * previously-applied batch id stays replay-skipped. Seeded-random cases
  * over a small key space (maximizing both shared-key folds and the
  * disjoint-key no-grow path). */
class CompactionPropertySpec extends AnyFunSuite {

  private val Keys = Seq(
    ("clickhouse_query_count", "type=select", ""),
    ("clickhouse_query_count", "type=insert", ""),
    ("chlogexporter_read_lines", "", ""),
    ("chlogexporter_errors", "type=not_found_query", ""))

  private def view(t: MetricsJdbcAppend.Target): Map[(String, String, String), Long] = {
    val conn = t.connect()
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT metric, labels, le, value FROM ${t.folded}")
      val buf = scala.collection.mutable.Map.empty[(String, String, String), Long]
      while (rs.next())
        buf((rs.getString(1), rs.getString(2), rs.getString(3))) = rs.getLong(4)
      buf.toMap
    } finally conn.close()
  }

  for (backend <- JdbcBackends.all)
  test(s"any interleaving of batches, compactions, replays: view = sum of uniquely-applied batches [${backend.name}]") {
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 25) {
      val db = s"cprop${backend.name}$case_"
      val t = MetricsJdbcAppend.Target(backend.url(db), "m")
      MetricsJdbcAppend.ensureTables(t)
      // the zero grid lands under ("seed", 0); it contributes zeros only
      val expected = scala.collection.mutable.Map.empty[(String, String, String), Long]
      val appliedIds = scala.collection.mutable.Set.empty[Long]
      var nextId = 0L
      for (_ <- 1 to 30) rnd.nextInt(4) match {
        case 0 | 1 => // apply a fresh batch (possibly empty)
          val rows = Keys.filter(_ => rnd.nextBoolean()).map { case (m, l, le) =>
            (m, l, le, 1L + rnd.nextInt(9).toLong)
          }
          assert(MetricsJdbcAppend.applyDelta(t, "q", nextId, rows),
            s"case $case_: fresh batch $nextId must land")
          rows.foreach { case (m, l, le, v) =>
            expected((m, l, le)) = expected.getOrElse((m, l, le), 0L) + v
          }
          appliedIds += nextId
          nextId += 1
        case 2 if appliedIds.nonEmpty => // replay a random old batch id
          val id = appliedIds.toSeq(rnd.nextInt(appliedIds.size))
          assert(!MetricsJdbcAppend.applyDelta(t, "q", id,
            Seq(("clickhouse_query_count", "type=select", "", 999L))),
            s"case $case_: replay of $id must be skipped")
        case _ => // compact (any time, any state)
          MetricsJdbcAppend.compact(t, "q")
      }
      val got = view(t).filter(_._2 != 0L) // drop the zero grid & zero sums
      val want = expected.toMap.filter(_._2 != 0L)
      assert(got == want,
        s"case $case_: view-only ${got.toSet -- want.toSet}, missing ${want.toSet -- got.toSet}")
      // after everything, EVERY applied id still probes as seen
      for (id <- appliedIds)
        assert(!MetricsJdbcAppend.applyDelta(t, "q", id, Seq.empty),
          s"case $case_: batch $id lost its presence after compaction")
    }
  }
}
