package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** True tail-follow of a SINGLE appending log file (SURVEY §2.1 S1; the
  * reference's primary mode, `tail.TailFile` with `Follow:true, ReOpen:true`
  * at main.go:100-106) as a DataSource V2 micro-batch streaming source —
  * the one delivery mode the directory-watching `readStream.text` substitute
  * cannot cover: data appended to the *current* file.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.sources.TailFileSourceProvider")
  *     .option("path", "/var/log/clickhouse-server.log")
  *     .option("fromStart", "false")   // default: seek-to-EOF (main.go:95)
  *     .option("maxBytesPerTrigger", "134217728") // optional admission cap
  *     .load()                          // schema: seq long, value string
  * }}}
  *
  * Semantics mirrored from the reference:
  *   - start offset = EOF at query start by default; `fromStart=true` reads
  *     from offset 0 (`--from-start`, main.go:96-99);
  *   - only complete (newline-terminated) lines are delivered — a partial
  *     trailing line waits for its newline, like the tail library's
  *     line-buffered channel;
  *   - truncation/recreation (copytruncate rotation) is detected by the file
  *     shrinking below the committed offset → follow restarts at 0
  *     (`ReOpen:true`);
  *   - `seq` is the line's start byte offset — a monotone arrival-order key
  *     for the keyed merge (same role as the line number in batch mode);
  *   - `maxBytesPerTrigger` (admission control, default unbounded): each
  *     poll admits at most that many NEW bytes, cut back to a line
  *     boundary — so `fromStart` on a huge backlog (or a restart after
  *     downtime) drains in bounded micro-batches instead of planning one
  *     giant first batch that must fit in memory at once. A single line
  *     longer than the cap is still admitted whole (progress guarantee).
  *     The true tail is still reported to progress events
  *     ([[SupportsAdmissionControl.reportLatestOffset]]) as the backlog
  *     gauge.
  *
  * Scale notes: a tail source is inherently single-file/single-partition —
  * the cluster story is MANY tailed files (one per server), each a cheap
  * single-partition scan feeding the id-partitioned stateful merge; the
  * shuffle to state partitions is where parallelism happens, exactly as with
  * the directory source. Offsets are byte positions, so checkpoint recovery
  * resumes mid-file without re-reading history.
  */
class TailFileSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TailFileSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TailFileTable(properties.get("path"),
      java.lang.Boolean.parseBoolean(properties.getOrDefault("fromStart", "false")),
      java.lang.Long.parseLong(properties.getOrDefault("maxBytesPerTrigger", "0")),
      properties.getOrDefault("backfill", "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
}

object TailFileSource {
  val Schema: StructType = new StructType()
    .add("seq", LongType, nullable = false)
    .add("value", StringType, nullable = false)

  /** Read accounting: byte-range reads actually opened (incremented once
    * per [[TailRangeReader]] that reaches the file). Local-mode tests use
    * the delta to assert the serving pipeline reads each micro-batch's
    * range ONCE — the former two-branch delivery union read it twice. */
  val rangesOpened = new java.util.concurrent.atomic.AtomicLong

  /** Poll accounting: admission-control `latestOffset(start, limit)` calls
    * (one per trigger iteration). The `--trigger <interval>` spec asserts a
    * quiet log under ProcessingTime polls a few times per interval instead
    * of the default ASAP busy-loop. */
  val pollsObserved = new java.util.concurrent.atomic.AtomicLong

  /** Last position p in [from, len) such that byte p-1 (the byte before p)
    * is '\n'; `from` if no newline arrived yet. Scanned over the new bytes
    * only — O(appended data), not O(file). */
  def lastLineBoundary(path: String, from: Long): Long =
    boundedLineBoundary(path, from, Long.MaxValue)

  /** [[lastLineBoundary]] under an admission-control byte budget: the last
    * line boundary within [from, from+cap] — except when the FIRST line
    * starting at `from` is itself longer than `cap`, in which case that
    * line's own boundary (the first newline past the cap), so a poll
    * always admits at least one complete line and a backlog drain can
    * never stall on an oversized line. Returns `from` while no newline has
    * arrived yet (a partial trailing line waits for its terminator, capped
    * or not). The scan stops at the budget instead of chasing a growing
    * EOF — under a cap a poll is O(cap), not O(backlog). */
  def boundedLineBoundary(path: String, from: Long, cap: Long): Long = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      if (len <= from) return from
      val budgetEnd = if (cap >= len - from) len else from + cap
      var boundary = from
      raf.seek(from)
      val buf = new Array[Byte](64 * 1024)
      var pos = from
      var n = raf.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          val p = pos + i + 1 // boundary position if buf(i) is '\n'
          if (buf(i) == '\n' && (p <= budgetEnd || boundary == from))
            boundary = p
          i += 1
        }
        pos += n
        // done once past the budget with a complete line in hand (the
        // oversized-first-line case keeps scanning for its newline)
        n = if (pos < len && (pos < budgetEnd || boundary == from)) raf.read(buf)
            else -1
      }
      boundary
    } finally raf.close()
  }

  /** The byte budget a ReadLimit denotes: an engine-passed `ReadMaxBytes`
    * (possibly inside a composite) wins; anything else falls back to the
    * source's configured `maxBytesPerTrigger` (rows/files limits don't map
    * onto a byte-range tail). */
  def byteCapOf(limit: ReadLimit, fallback: Long): Long = limit match {
    case b: org.apache.spark.sql.connector.read.streaming.ReadMaxBytes =>
      b.maxBytes()
    case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
      c.getReadLimits.collectFirst {
        case b: org.apache.spark.sql.connector.read.streaming.ReadMaxBytes =>
          b.maxBytes()
      }.getOrElse(fallback)
    case _ => fallback
  }
}

/** Stream position: byte offset `pos` within rotation generation `epoch`,
  * plus the filesystem identity (`fileKey` — dev/inode) of that generation.
  * The epoch increments every time truncation/recreation is detected, so
  * the emitted `seq` (epoch << 44 | line offset) stays monotone across
  * copytruncate rotations — the keyed merge's arrival order survives.
  * Carrying the fileKey in the offset lets a restarted query detect a
  * move+recreate rotation that happened while it was down. */
final case class TailOffset(epoch: Long, pos: Long, fileKey: String = "")
    extends Offset {
  override def json(): String = s"$epoch:$pos:$fileKey"
}

object TailOffset {
  def parse(json: String): TailOffset = json.split(":", 3) match {
    case Array(e, p, k) => TailOffset(e.toLong, p.toLong, k)
    case Array(e, p) => TailOffset(e.toLong, p.toLong) // pre-fileKey checkpoints
  }

  /** Filesystem identity of the file (dev+inode on POSIX); "" when the
    * filesystem exposes none. */
  def keyOf(path: String): String =
    try String.valueOf(java.nio.file.Files
      .readAttributes(java.nio.file.Paths.get(path),
        classOf[java.nio.file.attribute.BasicFileAttributes])
      .fileKey()).replace(":", ";") // ':' is the offset-json separator
    catch { case _: java.io.IOException => "" }
}

class TailFileTable(path: String, fromStart: Boolean,
    maxBytesPerTrigger: Long = 0L, backfill: Seq[String] = Nil)
    extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"tailf:$path"
  override def schema(): StructType = TailFileSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = TailFileSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TailFileMicroBatchStream(path, fromStart, maxBytesPerTrigger, backfill)
      override def toBatch: Batch = throw new UnsupportedOperationException(
        "tailf is a streaming-only source; use LogSource.readText for batch")
    }
}

/** @param backfill BACKFILL-THEN-FOLLOW: rotated-away archive files to
  *   drain IN ORDER before attaching to the live `path` — the "point the
  *   exporter at history too" deployment ask (`--from-start` only covers
  *   the live file; after a logrotate the history lives in `.1`, `.2`, …).
  *   Each archive occupies one pre-live epoch (epochs `0 … n-1`; the live
  *   file starts at epoch `n` and rotations keep incrementing), so `seq`
  *   stays monotone across the whole chain and the order-sensitive keyed
  *   merge sees archive lines strictly before live lines. Archives are
  *   static complete files: an unterminated final line IS the last line
  *   and is admitted whole; admission control (`maxBytesPerTrigger`)
  *   bounds each poll within one file. Archives may be GZIPPED
  *   (`logrotate compress`, the distro default): a gz archive drains as
  *   one whole epoch — compressed bytes have no line boundaries, so the
  *   byte budget degrades to per-archive granularity there — decompressed
  *   through the reader's chunked line splitter (memory stays one chunk +
  *   one line, same as plain ranges). With backfill the live file is
  *   read from position 0 regardless of `fromStart` — archives + live are
  *   one continuous history. Restart mid-backfill resumes from the
  *   checkpointed (epoch, pos) like any other position. Archives must
  *   exist at start (fail-fast pre-flight, typo protection); once the
  *   backfill has drained, restarting WITHOUT `--backfill` against the
  *   same checkpoint is safe — the restored epoch is simply treated as a
  *   live generation and keeps counting, so archives can be deleted after
  *   they've been processed. Across restarts the chain may only SHRINK
  *   (drop drained archives): epochs are positional indices into the
  *   chain, so GROWING it would remap a restored offset — rejected fail-
  *   fast where detectable (a live-keyed offset below the new liveEpoch;
  *   see `observe`); reprocessing more history needs a fresh checkpoint. */
class TailFileMicroBatchStream(path: String, fromStart: Boolean,
    maxBytesPerTrigger: Long = 0L, backfill: Seq[String] = Nil)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Pre-flight validation exactly where the reference runs it: before the
  // tail attaches (main.go:81-85), with the is-directory fix. Archives are
  // literal paths and must exist too — and may be GZIPPED (`logrotate
  // compress` is the distro default); the live file keeps the reference's
  // archive rejection.
  LogSource.checkLogFile(path)
  backfill.foreach(LogSource.checkBackfillFile)

  /** First live epoch; epochs below it index [[backfill]]. */
  private val liveEpoch: Long = backfill.size.toLong

  /** Which archives are gzip (magic sniffed ONCE — archives are static). */
  private val gzArchive: IndexedSeq[Boolean] =
    backfill.map(LogSource.isGzip).toIndexedSeq

  /** Highest (epoch, pos) this stream has observed — from initialOffset,
    * checkpoint-restored offsets, or commits — the tail position
    * latestOffset() advances from. */
  @volatile private var known: TailOffset = TailOffset(0L, -1L)
  private def observe(o: TailOffset): TailOffset = {
    // Epochs are POSITIONAL indices into the current backfill chain
    // (liveEpoch = backfill.size), and the checkpoint records positions,
    // not the chain — so growing the chain across a restart would silently
    // remap a restored offset (a live position re-read as mid-archive:
    // skipped history + a full live re-read double-counting every metric).
    // Detectable exactly when it is dangerous: archive positions always
    // carry an EMPTY fileKey (set only at the live hand-over), so a keyed
    // offset below the current liveEpoch can only be a live checkpoint
    // from a run with FEWER archives. Shrinking stays legal: drained
    // archives may be dropped (restored epoch >= liveEpoch is just a live
    // generation), per the class scaladoc.
    require(o.epoch >= liveEpoch || o.fileKey.isEmpty,
      s"checkpointed offset (epoch=${o.epoch}, pos=${o.pos}) is a LIVE position " +
        s"but the current --backfill chain has ${backfill.size} archives — the " +
        "chain grew across a restart, which remaps epochs; restart with the " +
        "original chain or reprocess from a fresh checkpoint")
    val k = known
    if (o.epoch > k.epoch || (o.epoch == k.epoch && o.pos > k.pos)) known = o
    o
  }

  /** Computed ONCE and memoized: the fleet composition calls initialOffset
    * from both latestOffset (via the known-position bootstrap) and
    * planInputPartitions (for a path absent from the start-offset map —
    * a fleet grown across a restart, or a glob-discovered member); a
    * re-computed EOF between those two calls would plan an inverted empty
    * range and permanently skip the lines appended in between. */
  private lazy val initial: TailOffset =
    if (backfill.nonEmpty) TailOffset(0L, 0L, "") // start of the archive chain
    else TailOffset(0L,
      if (fromStart) 0L
      else TailFileSource.lastLineBoundary(path, 0L), // seek-to-EOF (main.go:95)
      TailOffset.keyOf(path))

  override def initialOffset(): Offset = observe(initial)

  /** Advertise the configured byte budget so the engine's admission
    * control (incl. `Trigger.AvailableNow`'s catch-up planning) sees the
    * same cap the source enforces. */
  override def getDefaultReadLimit: ReadLimit =
    if (maxBytesPerTrigger > 0) ReadLimit.maxBytes(maxBytesPerTrigger)
    else ReadLimit.allAvailable()

  /** The admission-control poll Spark actually drives: `start` is the
    * RESTORED position on the first post-restart call — observing it
    * before computing the tail closes the restart race where a plain
    * `latestOffset()` ran before `deserializeOffset` replayed the
    * checkpoint and emitted a regressed epoch-0 offset (which the next
    * poll then mistook for a rotation and re-read the whole file). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    TailFileSource.pollsObserved.incrementAndGet()
    observe(start.asInstanceOf[TailOffset])
    admit(TailFileSource.byteCapOf(limit, maxBytesPerTrigger))
  }

  /** `Trigger.AvailableNow` ("drain and exit" — the batch-backfill run
    * mode): the engine announces it before the first poll; the DRAIN GOAL —
    * the true tail (across the whole backfill chain) at that moment — is
    * captured lazily on the first [[admit]] instead of here, because this
    * call can precede the checkpoint-restore replay (`latestOffset(start,
    * limit)` observes the restored position first): a goal computed from
    * the fresh initial position would number rotation epochs relative to
    * the wrong generation and a restored higher epoch would read as
    * already-past-goal, ending the drain before it started — the same
    * restart race [[latestOffset]]'s scaladoc records, one call earlier. */
  @volatile private var drainMode: Boolean = false
  @volatile private var drainGoal: Option[TailOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = { drainMode = true }

  /** The drain goal, captured at first need from the settled known
    * position. Lines appended after capture wait for the next run.
    * BOUNDARY-PRECISE, unlike the O(1) gauge tail ([[reportLatestOffset]]):
    * the drain clamps admission to `g.pos`, which must be a LINE BOUNDARY
    * of the goal generation (see [[admit]]'s clamp cases) — so this walk
    * pays the full newline scan, ONCE per drain. Archives are static, so
    * the walk jumps the chain straight to the live epoch; from a live
    * position it only chases rotations, one epoch per step. */
  private def goal(): TailOffset = drainGoal.getOrElse {
    if (known.pos < 0) initialOffset()
    var cur =
      if (known.epoch < liveEpoch) TailOffset(liveEpoch, 0L, "") else known
    var steps = 0
    var next = computeNext(cur, Long.MaxValue)
    while (steps <= 2 && next.exists(_ != cur)) {
      cur = next.get
      next = computeNext(cur, Long.MaxValue)
      steps += 1
    }
    drainGoal = Some(cur)
    cur
  }

  override def latestOffset(): Offset = admit(maxBytesPerTrigger)

  /** The TRUE tail position regardless of the byte budget — Spark surfaces
    * it as `latestOffset` in progress events, so `sources[0].latestOffset
    * - endOffset` is the live backlog gauge while a capped drain is in
    * flight. Never observe()d: it must not advance the admitted position. */
  override def reportLatestOffset(): Offset = {
    if (known.pos < 0) initialOffset()
    // O(stat): the gauge never plans ranges, so the reported tail needn't
    // be a line boundary — the raw live EOF is the honest backlog end (an
    // unterminated trailing line IS pending bytes). A newline-scanning
    // report here cost O(backlog²/cap) file reads over a capped drain:
    // every progress event re-scanned all unadmitted bytes. The
    // boundary-precise form lives in [[goal]], paid once per drain.
    // Archives are STATIC: mid-backfill the reported position is the
    // remaining archive bytes PLUS the live length — a BACKLOG measure
    // (reportLatestOffset is informational; admission plans from [[admit]]
    // and the drain goal from [[goal]]), so the telemetry gauge counts
    // everything still to process, not just the live file.
    val k = known
    val liveLen = new java.io.File(path).length()
    if (k.epoch < liveEpoch) {
      val remainingArchives = (k.epoch.toInt until liveEpoch.toInt).map { i =>
        val len = new java.io.File(backfill(i)).length()
        if (i == k.epoch.toInt) math.max(0L, len - k.pos) else len
      }.sum
      TailOffset(liveEpoch, liveLen + remainingArchives, "")
    } else {
      val curKey = TailOffset.keyOf(path)
      if (curKey.isEmpty && liveLen == 0L) k // mid-rotation gap: hold
      else if (liveLen < k.pos ||
          (k.fileKey.nonEmpty && curKey.nonEmpty && curKey != k.fileKey))
        // an as-yet-unadmitted rotation (shrink or identity change): the
        // whole NEW generation is the backlog — reporting the new length
        // under the OLD epoch would subtract positions of two different
        // files in the gauge
        TailOffset(k.epoch + 1, liveLen, curKey)
      else k.copy(pos = liveLen)
    }
  }

  /** Poll-and-advance under a byte budget (≤0 = unbounded). Package-visible
    * so the fleet composition drives every member with ONE budget per
    * poll instead of constructing members cap-aware.
    *
    * In drain mode ([[prepareForTriggerAvailableNow]]) polls additionally
    * stop at the captured goal: within the goal's epoch the byte budget
    * shrinks to the remaining gap (the goal is itself a line boundary, so
    * the bounded scan lands exactly on it); a poll that would cross PAST
    * the goal's epoch (a rotation racing the drain) holds position —
    * the rotated-away remainder is lost exactly as in follow mode, and
    * the no-progress poll is what ends the run. */
  private[sources] def admit(cap: Long): Offset = {
    if (known.pos < 0) initialOffset()
    val k = known
    val unbounded = if (cap > 0) cap else Long.MaxValue
    if (!drainMode) return computeNext(k, unbounded).map(observe).getOrElse(k)
    val g = goal()
    if (k.epoch > g.epoch || (k.epoch == g.epoch && k.pos >= g.pos)) return k
    val eff =
      if (k.epoch == g.epoch) math.min(unbounded, g.pos - k.pos) else unbounded
    computeNext(k, eff).map {
      case n if n.epoch > g.epoch => k // rotation overtook the goal
      case n if n.epoch == g.epoch && n.pos > g.pos &&
          g.fileKey.nonEmpty && n.fileKey.nonEmpty && n.fileKey != g.fileKey =>
        // the goal's GENERATION rotated away while the archives drained
        // (same epoch number, different file identity): g.pos is a line
        // boundary of the old file, NOT of the one n was scanned from —
        // clamping would checkpoint a mid-line offset into the new file.
        // Like the epoch-overtake case above: the old generation's
        // remaining bytes are gone, report no progress and let the drain
        // end.
        k
      case n if n.epoch == g.epoch && n.pos > g.pos =>
        // an epoch hand-over (archive -> live) can land past a goal set
        // before the live file grew; the goal position is a boundary of
        // the same generation (identity checked above), so clamping is safe
        TailOffset(g.epoch, g.pos, n.fileKey)
      case n => n
    }.map(observe).getOrElse(k)
  }

  /** One tail poll from position `k` under byte budget `cap`; None when an
    * in-flight rotation raced the poll (report no progress, let the next
    * poll see the settled file). Pure read — callers decide whether the
    * result advances the admitted position ([[admit]]) or is merely
    * reported ([[reportLatestOffset]]). */
  private def computeNext(k: TailOffset, cap: Long): Option[TailOffset] = {
    if (k.epoch < liveEpoch) return Some(computeNextArchive(k, cap))
    // ReOpen semantics: the follow restarts at 0 in a NEW epoch when the
    // file was truncated in place (length shrank below our position) OR
    // replaced by a new file (dev/inode changed — catches move+recreate
    // even if the new file already grew past the old offset). Unread bytes
    // of the old generation are lost, as with the reference's reopened tail.
    //
    // A poll can race an in-flight move+recreate: identity, length, and
    // the boundary scan are separate filesystem reads, so a key read
    // during the gap (file absent → "") combined with a length read after
    // the new file lands would skip the identity check and resume MID-FILE
    // in the new generation. Two guards close the window: hold position
    // while the file is absent, and re-validate the identity AFTER the
    // boundary scan — if it moved underneath us, report no progress and
    // let the next poll see the settled file.
    val curKey = TailOffset.keyOf(path)
    val len = new java.io.File(path).length()
    if (curKey.isEmpty && len == 0L) Some(k) // mid-rotation gap: hold position
    else {
      val rotated = len < k.pos ||
        (k.fileKey.nonEmpty && curKey.nonEmpty && curKey != k.fileKey)
      val next =
        if (rotated)
          TailOffset(k.epoch + 1,
            TailFileSource.boundedLineBoundary(path, 0L, cap), curKey)
        else
          k.copy(pos = TailFileSource.boundedLineBoundary(path, k.pos, cap),
            fileKey = curKey)
      if (TailOffset.keyOf(path) != curKey) None else Some(next)
    }
  }

  /** One poll step while draining archive epoch `k.epoch`: advance within
    * the (static, complete) archive under the byte budget; an archive tail
    * without a newline is admitted whole (it IS the final line); a drained
    * archive hands over to the next one — or to the live file from 0. */
  private def computeNextArchive(k: TailOffset, cap: Long): TailOffset = {
    val f = backfill(k.epoch.toInt)
    val len = new java.io.File(f).length()
    if (k.pos < len)
      k.copy(pos = archiveAdvance(k.epoch.toInt, k.pos, cap))
    else if (k.epoch + 1 < liveEpoch)
      TailOffset(k.epoch + 1, archiveAdvance(k.epoch.toInt + 1, 0L, cap), "")
    else
      TailOffset(liveEpoch,
        TailFileSource.boundedLineBoundary(path, 0L, cap), TailOffset.keyOf(path))
  }

  /** One admission step within archive `i` from `from`: plain archives cut
    * to a bounded line boundary (an unterminated tail IS the last line —
    * advance to len); GZIPPED archives are admitted WHOLE — compressed
    * bytes have no line boundaries to cut at, so the per-poll byte budget
    * degrades to a per-archive progress guarantee, the same rule as the
    * oversized single line. Positions in a gz epoch are therefore only
    * ever 0 or the compressed length. */
  private def archiveAdvance(i: Int, from: Long, cap: Long): Long = {
    val f = backfill(i)
    if (gzArchive(i)) new java.io.File(f).length()
    else {
      val t = TailFileSource.boundedLineBoundary(f, from, cap)
      if (t > from) t else new java.io.File(f).length()
    }
  }

  override def deserializeOffset(json: String): Offset =
    observe(TailOffset.parse(json))

  override def commit(end: Offset): Unit = {
    observe(end.asInstanceOf[TailOffset])
    ()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset]
    val e = observe(end.asInstanceOf[TailOffset])
    if (backfill.isEmpty) {
      if (e.epoch > s.epoch) Array(TailRange(path, e.epoch, 0L, e.pos)) // rotated
      else if (e.pos == s.pos) Array.empty // empty batch
      else Array(TailRange(path, e.epoch, s.pos, e.pos))
    } else {
      // a batch may span several epochs (archive hand-overs); plan one
      // range per crossed epoch. Archives crossed whole end at their file
      // length (emitTrailing covers an unterminated final line); a LIVE
      // generation rotated away mid-batch keeps the tail semantics — its
      // unread bytes are lost with the old file.
      (s.epoch to e.epoch).flatMap { ep =>
        val isArchive = ep < liveEpoch
        val p = if (isArchive) backfill(ep.toInt) else path
        val startPos = if (ep == s.epoch) s.pos else 0L
        val endPos =
          if (ep == e.epoch) e.pos
          else if (isArchive) new java.io.File(p).length()
          else -1L // rotated-away live generation: bytes gone
        if (endPos > startPos)
          Some(TailRange(p, ep, startPos, endPos, emitTrailing = isArchive,
            gz = isArchive && gzArchive(ep.toInt)))
        else None
      }.toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new TailRangeReader(p.asInstanceOf[TailRange])
    }

  override def stop(): Unit = ()
}

/** @param gz the range is a whole GZIPPED archive ([start, end) are
  *   compressed bytes, always the full file): the reader decompresses the
  *   stream and line-splits it. `seq` offsets are DECOMPRESSED positions —
  *   monotone within the epoch exactly like plain byte offsets. */
final case class TailRange(path: String, epoch: Long, start: Long, end: Long,
    emitTrailing: Boolean = false, gz: Boolean = false) extends InputPartition

/** Reads the newline-terminated lines in byte range [start, end).
  *
  * Ranges are STREAMED in bounded chunks, never buffered whole: with the
  * unbounded default (`allAvailable`), a `--from-start` attach to a big
  * backlog plans ONE range covering the entire file — a whole-range buffer
  * would overflow `Array[Byte]`'s Int length past 2 GiB and blow task
  * memory long before. Memory here is one chunk + the current line, for
  * plain AND gz ranges (the gz stream decompresses through the same
  * chunked line splitter). */
class TailRangeReader(range: TailRange,
    private[sources] val chunkSize: Int = 1 << 20)
    extends PartitionReader[InternalRow] {
  private var in: java.io.InputStream = null

  private val lines: Iterator[(Long, String)] = {
    // The file may have been truncated between offset planning and this
    // read (the planned end offset is already committed to the offset log).
    // The range's bytes are gone — deliver nothing rather than crash-loop;
    // the next latestOffset() detects the rotation and bumps the epoch.
    if (range.end <= range.start ||
        new java.io.File(range.path).length() < range.end) Iterator.empty
    else new Iterator[(Long, String)] {
      TailFileSource.rangesOpened.incrementAndGet()
      // base/limit are in the LINE-OFFSET space: file positions for plain
      // ranges, decompressed positions (base 0, read to stream end) for gz
      private val (baseAbs, toRead) =
        if (range.gz) {
          // REPLAY DETERMINISM: bound the COMPRESSED input at range.end —
          // a task retry after the archive grew (logrotate still writing
          // it) must deliver exactly the planned bytes' content, not
          // whatever the file holds at read time. A gz range planned with
          // start > 0 means the archive grew AFTER it drained whole:
          // gzip cannot resume mid-stream, so the growth is ignored
          // (delivering from 0 would double-count every line) — archives
          // are static complete files by contract.
          if (range.start > 0) in = java.io.InputStream.nullInputStream()
          else {
            val fis = new java.io.FileInputStream(range.path)
            val bounded = new java.io.FilterInputStream(fis) {
              private var left = range.end
              override def read(): Int =
                if (left <= 0) -1
                else { val b = super.read(); if (b >= 0) left -= 1; b }
              override def read(b: Array[Byte], off: Int, len: Int): Int = {
                if (left <= 0) return -1
                val n = super.read(b, off, math.min(len.toLong, left).toInt)
                if (n > 0) left -= n
                n
              }
            }
            try in = new java.util.zip.GZIPInputStream(bounded, 64 * 1024)
            catch { case e: Throwable => fis.close(); throw e }
          }
          (0L, Long.MaxValue)
        } else {
          val fis = new java.io.FileInputStream(range.path)
          var toSkip = range.start
          while (toSkip > 0) {
            val s = fis.skip(toSkip)
            if (s <= 0) throw new java.io.IOException(
              s"cannot seek to ${range.start} in ${range.path}")
            toSkip -= s
          }
          in = fis
          (range.start, range.end - range.start)
        }
      private val seqBase = range.epoch << 44 // monotone across rotations
      private val buf = new Array[Byte](chunkSize)
      private var consumed = 0L // bytes delivered from the stream so far
      private var bufAbs = baseAbs // absolute position of buf(0)
      private var bufLen = 0
      private var bufIdx = 0
      private var lineStartAbs = baseAbs
      // bytes of the current line accumulated across chunk boundaries
      private val carry = new java.io.ByteArrayOutputStream()
      private var done = false
      private var pending: (Long, String) = null

      private def refill(): Boolean = {
        if (consumed >= toRead) return false
        val want = math.min(buf.length.toLong, toRead - consumed).toInt
        // a plain-file truncation racing the read surfaces as a short
        // read/EOF; a TRUNCATED/CORRUPT gz stream (crash during logrotate
        // compression — the 2-byte magic pre-flight can't see it) throws
        // EOFException/ZipException mid-read. Both end gracefully with
        // the lines that decoded cleanly: the archive is static, nothing
        // more is coming, and failing the task would crash-loop the query
        // against the same planned range forever.
        val n =
          try in.read(buf, 0, want)
          catch {
            case _: java.io.EOFException | _: java.util.zip.ZipException
                if range.gz => -1
          }
        if (n <= 0) return false
        bufAbs = baseAbs + consumed
        consumed += n
        bufLen = n
        bufIdx = 0
        true
      }

      private def advance(): Unit = {
        pending = null
        while (pending == null && !done) {
          if (bufIdx >= bufLen && !refill()) {
            done = true
            in.close(); in = null
            // `end` is a line boundary — except for a fully-drained
            // ARCHIVE whose final line has no terminating newline: that
            // remainder IS the last line (the file is complete)
            if (range.emitTrailing && carry.size() > 0) {
              pending = ((seqBase | lineStartAbs,
                new String(carry.toByteArray, StandardCharsets.UTF_8)))
              carry.reset()
            }
            return
          }
          var nl = -1
          var i = bufIdx
          while (i < bufLen && nl < 0) {
            if (buf(i) == '\n') nl = i else i += 1
          }
          if (nl >= 0) {
            carry.write(buf, bufIdx, nl - bufIdx)
            pending = ((seqBase | lineStartAbs,
              new String(carry.toByteArray, StandardCharsets.UTF_8)))
            carry.reset()
            bufIdx = nl + 1
            lineStartAbs = bufAbs + bufIdx
          } else {
            carry.write(buf, bufIdx, bufLen - bufIdx)
            bufIdx = bufLen
          }
        }
      }

      advance()
      override def hasNext: Boolean = pending != null
      override def next(): (Long, String) = {
        val r = pending
        advance()
        r
      }
    }
  }

  private var cur: (Long, String) = _
  override def next(): Boolean =
    if (lines.hasNext) { cur = lines.next(); true } else false
  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](cur._1, UTF8String.fromString(cur._2)))
  override def close(): Unit = {
    // the streaming iterator closes its handle at exhaustion; this covers
    // a task that stops consuming early (e.g. a LIMIT)
    if (in != null) { in.close(); in = null }
  }
}
