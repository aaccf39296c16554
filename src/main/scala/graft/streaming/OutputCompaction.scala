package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IndexFiles

/** CURATED-OUTPUT compaction — the small-files bound for the ingest
  * daemons' sinks. [[StreamingCuration.ingestTo]] and [[graft.VecIngest]]
  * land one `outPath/ingest_batch=<id>` parquet directory per micro-batch
  * for exactly-once replay (a re-delivered batch overwrites its own dir);
  * without maintenance that is ~500k directories/year at a minute-level
  * trigger — the classic downstream-read killer at 100 TB, and the one
  * artifact family that did NOT yet compact (the index delta chains do:
  * [[graft.operators.Dedup.compactIndex]], `--near-compact-every`). The
  * reference consumes logrotate'd BOUNDED file sets (main.go:100-106
  * `ReOpen`); this gives the output side the same boundedness.
  *
  * Layout under `outPath` (any Hadoop-FS scheme — everything goes through
  * [[IndexFiles]]):
  *
  *   ingest_batch=<id>/   one per landed micro-batch (the live tail)
  *   compacted_v<V>/{data,meta}   folded batches; meta carries `last_batch`
  *
  * The rules are exactly the LSM discipline the index chains prove:
  *
  *   - [[compact]] folds every batch dir at or below `upTo` into a new
  *     base version stamped `last_batch` = the highest folded id, publishes
  *     it by atomic tmp-rename, then sweeps the folded dirs and superseded
  *     bases. A crash between publish and sweep leaves only dead files the
  *     stamp rule makes invisible (and the next compaction deletes).
  *   - [[read]] is base `data` ∪ batch dirs with id ABOVE the stamp — the
  *     accumulated corpus, contents-identical to the never-compacted union
  *     (spec-pinned in OutputCompactionSpec).
  *   - a REPLAYED batch whose id is at or below the stamp (crash between
  *     compaction and checkpoint commit) must SKIP landing — its rows are
  *     in the base, and re-creating the dir would double them in every
  *     read. The daemons check [[highWater]] at run start and their own
  *     in-memory stamp after in-run compactions (the `--bm25-stats`
  *     swallowed-replay rule, applied to the output side).
  *
  * `upTo` exists because compaction runs INSIDE a foreachBatch body: dirs
  * beyond the current batch id cannot exist in a healthy run, but bounding
  * the fold keeps a foreign half-written leftover from ever being folded.
  * Single-writer contract, same as the index chains. */
object OutputCompaction {

  private[graft] val BatchPrefix = "ingest_batch="
  private[graft] val BasePrefix = "compacted_v"

  /** The highest batch id the latest compacted base incorporates; -1 when
    * nothing was ever compacted (batch ids start at 0, so every id is
    * above a fresh path's stamp). */
  def highWater(spark: SparkSession, outPath: String): Long =
    IndexFiles.numbered(spark, outPath, BasePrefix).lastOption
      .map { case (_, p) =>
        spark.read.parquet(s"$p/meta").head().getAs[Long]("last_batch") }
      .getOrElse(-1L)

  /** The accumulated curated corpus when any exists: latest base `data` ∪
    * live batch dirs above the stamp. Dead batch dirs (id ≤ stamp — an
    * interrupted sweep's leftovers) are invisible by construction. */
  def readIfAny(spark: SparkSession, outPath: String): Option[DataFrame] = {
    val bases = IndexFiles.numbered(spark, outPath, BasePrefix)
    val stamp = highWater(spark, outPath)
    val live = IndexFiles.numbered(spark, outPath, BatchPrefix)
      .filter(_._1 > stamp).map(_._2.toString)
    val parts =
      bases.lastOption.map { case (_, p) => spark.read.parquet(s"$p/data") }.toSeq ++
        (if (live.nonEmpty) Seq(spark.read.parquet(live: _*)) else Nil)
    parts.reduceOption(_ unionByName _)
  }

  /** [[readIfAny]] that demands output exists — the daemon-internal reads
    * (retrain corpus, offset bases) where an empty sink is a bug. */
  def read(spark: SparkSession, outPath: String): DataFrame =
    readIfAny(spark, outPath)
      .getOrElse(throw new IllegalStateException(s"no curated output at $outPath"))

  /** Fold the live batch dirs (stamp, upTo] into a new stamped base and
    * sweep them. No-op when nothing is foldable (still sweeps dead dirs an
    * interrupted previous sweep left). Contents-identical to the
    * pre-compaction [[read]]; crash-safe at every boundary by the stamp
    * rule. */
  def compact(spark: SparkSession, outPath: String,
      upTo: Long = Long.MaxValue,
      layout: Option[DataFrame => DataFrame] = None): Unit = {
    val stamp = highWater(spark, outPath)
    val all = IndexFiles.numbered(spark, outPath, BatchPrefix)
    val dead = all.filter(_._1 <= stamp)
    val fold = all.filter { case (id, _) => id > stamp && id <= upTo }
    if (fold.isEmpty) {
      dead.foreach { case (_, p) => IndexFiles.delete(spark, p.toString) }
      return
    }
    val bases = IndexFiles.numbered(spark, outPath, BasePrefix)
    val parts =
      bases.lastOption.map { case (_, p) => spark.read.parquet(s"$p/data") }.toSeq :+
        spark.read.parquet(fold.map(_._2.toString): _*)
    val v = bases.map(_._1).maxOption.getOrElse(0L) + 1
    val newStamp = fold.map(_._1).max
    val tmp = s"$outPath/$BasePrefix$v.tmp"
    IndexFiles.delete(spark, tmp)
    // the write MATERIALIZES the union into the tmp dir before anything is
    // deleted; the publish is the atomic visibility flip. An optional
    // layout transform (the daemons' --layout z-order) re-clusters the
    // folded base so the LONG-LIVED files keep box-prunable min/max stats
    // (per-batch layout alone would be lost at every fold).
    val folded = parts.reduce(_ unionByName _)
    layout.map(f => f(folded)).getOrElse(folded)
      .write.mode("overwrite").parquet(s"$tmp/data")
    import spark.implicits._
    Seq(newStamp).toDF("last_batch")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
    IndexFiles.publish(spark, tmp, s"$outPath/$BasePrefix$v")
    bases.foreach { case (_, p) => IndexFiles.delete(spark, p.toString) }
    (dead ++ fold).foreach { case (_, p) => IndexFiles.delete(spark, p.toString) }
  }
}
