package graft.streaming

import org.apache.spark.sql.Dataset

import graft.streaming.StreamingMerge.MergeOut

/** The dialect seam between the serving pipeline and a JDBC metric
  * backend: both dialects share the delta computation
  * ([[MetricsJdbcUpsert.deltaRows]]) and the per-batch contract (land the
  * delta exactly-once keyed by `(source, batchId)`, report a replay as
  * `false` so a resumed registry skips its fold too) — they differ only in
  * HOW a delta lands and where the cumulative rows are read back from.
  *
  *   - [[UpsertJdbcSink]]: transactional backends (Derby, PostgreSQL,
  *     MySQL) — `UPDATE`-folded keyed table + batch-id ledger; resume
  *     snapshot reads the table itself.
  *   - [[AppendJdbcSink]]: the ClickHouse SummingMergeTree shape — tagged
  *     delta INSERTs, fold on the read side; resume snapshot reads the
  *     fold view (`<table>_folded`), which is exactly the surface a
  *     ClickHouse deployment queries.
  */
sealed trait MetricsJdbcSink {
  /** Create backing tables/views if absent; idempotent. */
  def ensureTables(): Unit
  /** Land one micro-batch's delta; false = replay, skipped whole. */
  def writeDelta(source: String, batch: Dataset[MergeOut], batchId: Long): Boolean
  /** Cumulative `(metric, labels, le, value)` rows — the registry-resume
    * seed ([[PromRegistry.seedFrom]]). */
  def snapshot(): Seq[(String, String, String, Long)]
  /** The distinct ledger sources whose deltas the cumulative surface
    * contains (excluding the zero-grid `seed`). */
  def ledgerSources(): Seq[String]

  /** Refuse a registry resume when the cumulative surface contains ANOTHER
    * query's contributions: [[ledgerSources]] supports N queries writing
    * one table with disjoint tokens for the WAREHOUSE, but the resume
    * snapshot is the whole fold — seeding from a shared table would serve
    * the SUM of every query's counters as this exporter's own. The legacy
    * `merge` token counts as ours (the first post-upgrade batch claims it
    * — [[MetricsJdbcUpsert.applyDelta]]'s migration). */
  def verifyResumable(source: String): Unit = {
    val foreign = ledgerSources().filterNot(s =>
      s == source || s == "seed" || s == "merge")
    if (foreign.nonEmpty) throw new IllegalArgumentException(
      s"--resume-from-jdbc: the table also holds contributions from other " +
        s"pipelines (ledger sources: ${foreign.mkString(", ")}); resuming " +
        "would serve their sum as this exporter's counters. Use a dedicated " +
        "--jdbc-table per exporter when resuming.")
  }
}

object MetricsJdbcSink {
  /** Resolve a CLI dialect name. */
  def apply(dialect: String, url: String, table: String,
      compactEvery: Int = 0): MetricsJdbcSink =
    dialect match {
      case "upsert" =>
        require(compactEvery == 0,
          "--jdbc-compact-every is an append-dialect knob (the upsert table is always one row per key)")
        UpsertJdbcSink(MetricsJdbcUpsert.Target(url, table))
      case "append" =>
        AppendJdbcSink(MetricsJdbcAppend.Target(url, table), compactEvery)
      case other => throw new IllegalArgumentException(
        s"unknown jdbc dialect: $other (supported: upsert, append)")
    }

  /** Distinct `source` tokens of any relation carrying one — the upsert
    * dialect's ledger or the append dialect's delta table. */
  private[streaming] def distinctSources(
      connect: () => java.sql.Connection, relation: String): Seq[String] = {
    val conn = connect()
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT source FROM $relation GROUP BY source")
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      try { while (rs.next()) buf += rs.getString(1) } finally rs.close()
      buf.toSeq
    } finally conn.close()
  }
}

final case class UpsertJdbcSink(t: MetricsJdbcUpsert.Target) extends MetricsJdbcSink {
  override def ensureTables(): Unit = MetricsJdbcUpsert.ensureTables(t)
  override def writeDelta(source: String, batch: Dataset[MergeOut],
      batchId: Long): Boolean = MetricsJdbcUpsert.writeDelta(t, source, batch, batchId)
  override def snapshot(): Seq[(String, String, String, Long)] =
    MetricsJdbcUpsert.snapshot(t)
  override def ledgerSources(): Seq[String] =
    MetricsJdbcSink.distinctSources(() => t.connect(), t.ledger)
}

/** @param compactEvery fold the append table back to ~one batch per
  *   source every N APPLIED batches (0 = never): the operational form of
  *   [[MetricsJdbcAppend.compact]], keeping a long-running exporter's delta
  *   table bounded the way ClickHouse's background merges would. Replayed
  *   batches don't count toward the cadence (their deltas never landed). */
final case class AppendJdbcSink(t: MetricsJdbcAppend.Target,
    compactEvery: Int = 0) extends MetricsJdbcSink {
  private val applied = new java.util.concurrent.atomic.AtomicLong(0L)
  override def ensureTables(): Unit = MetricsJdbcAppend.ensureTables(t)
  override def writeDelta(source: String, batch: Dataset[MergeOut],
      batchId: Long): Boolean = {
    val landed = MetricsJdbcAppend.applyDelta(t, source, batchId,
      MetricsJdbcUpsert.collectDelta(batch))
    if (landed && compactEvery > 0 &&
        applied.incrementAndGet() % compactEvery == 0)
      MetricsJdbcAppend.compact(t, source)
    landed
  }
  override def snapshot(): Seq[(String, String, String, Long)] =
    MetricsJdbcUpsert.readRows(() => t.connect(), t.folded)
  override def ledgerSources(): Seq[String] =
    MetricsJdbcSink.distinctSources(() => t.connect(), t.deltas)
}
