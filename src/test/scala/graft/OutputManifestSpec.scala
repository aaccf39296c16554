package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.operators.IndexFiles
import graft.streaming.OutputCompaction

/** The CONSOLIDATED SEGMENT MANIFEST — a read-path cache over the
  * per-segment metas, trusted only when its version set equals the live
  * listing:
  *
  *   - with a healed manifest, planning reads ([[OutputCompaction
  *     .highWater]] → `segments()`) run ZERO Spark jobs — the per-segment
  *     meta parquet reads are gone from the hot path (positive control:
  *     deleting the manifest makes the same call pay ≥ 1 job, and heals
  *     the file back);
  *   - a STALE manifest (lost update: version set disagrees with the
  *     listing) is never trusted — reads fall back to the metas, return
  *     the exact corpus, and re-heal;
  *   - a TORN manifest (crash mid-write: missing `end` trailer) is
  *     ignored the same way;
  *   - `full`/`merged_from` survive the manifest round trip: after a
  *     tier merge publishes claims, the manifest-served visibility
  *     equals the meta-served one (same rows, claimed inputs ignored).
  */
class OutputManifestSpec extends SparkSpec {

  private def land(outPath: String, id: Long): Unit = {
    import spark.implicits._
    (id * 10 until id * 10 + 3).map(i => (i, "web", 2L, i * 2, 0L, 0L))
      .toDF("doc_id", "source", "n_tokens", "tok_offset", "chunk_first", "chunk_last")
      .write.mode("overwrite")
      .parquet(s"$outPath/${OutputCompaction.BatchPrefix}$id")
  }

  private def manifest(outPath: String) = new Path(s"$outPath/${OutputCompaction.SegManifest}")

  private def manifestText(outPath: String): String = {
    val f = IndexFiles.fs(spark, outPath)
    val in = f.open(manifest(outPath))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def writeManifestText(outPath: String, text: String): Unit = {
    val f = IndexFiles.fs(spark, outPath)
    val out = f.create(manifest(outPath), true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  /** Count Spark jobs started by `f`, polling the async listener bus
    * until it goes quiet so late events are not missed. */
  private def countJobs(f: => Unit): Int = {
    val l = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var last = -1; var quiet = 0
      while (quiet < 5) {
        Thread.sleep(100)
        val v = l.jobs.get
        if (v == last) quiet += 1 else { quiet = 0; last = v }
      }
      l.jobs.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def docIds(outPath: String): Set[Long] =
    OutputCompaction.read(spark, outPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("healed manifest: planning reads run zero Spark jobs; deletion is the positive control") {
    val outPath = Files.createTempDirectory("graft_om").toString + "/packed"
    land(outPath, 0); OutputCompaction.compact(spark, outPath, upTo = 0)
    land(outPath, 1); OutputCompaction.compact(spark, outPath, upTo = 1)
    val f = IndexFiles.fs(spark, outPath)
    assert(f.exists(manifest(outPath)), "mutators must pre-heal the manifest")

    // positive control FIRST: no manifest -> the same planning call pays
    // per-segment meta reads (>= 1 job) and heals the file back
    f.delete(manifest(outPath), false)
    val fallbackJobs = countJobs { OutputCompaction.highWater(spark, outPath); () }
    assert(fallbackJobs >= 1, s"fallback meta scan must run Spark jobs, saw $fallbackJobs")
    assert(f.exists(manifest(outPath)), "fallback must self-heal the manifest")

    val healedJobs = countJobs { OutputCompaction.highWater(spark, outPath); () }
    assert(healedJobs == 0,
      s"manifest-served planning must run zero Spark jobs, saw $healedJobs")
    assert(OutputCompaction.highWater(spark, outPath) == 1L)
  }

  test("stale manifest (lost update) is never trusted: reads fall back and re-heal") {
    val outPath = Files.createTempDirectory("graft_om_stale").toString + "/packed"
    land(outPath, 0); OutputCompaction.compact(spark, outPath, upTo = 0)
    land(outPath, 1); OutputCompaction.compact(spark, outPath, upTo = 1)
    val before = manifestText(outPath)
    land(outPath, 2); OutputCompaction.compact(spark, outPath, upTo = 2)
    val expected = docIds(outPath)

    // lost update: re-impose the 2-segment manifest under a 3-segment listing
    writeManifestText(outPath, before)
    assert(docIds(outPath) == expected,
      "a stale manifest must not hide the newer segment")
    assert(manifestText(outPath) != before, "the mismatch read must re-heal")
    assert(OutputCompaction.highWater(spark, outPath) == 2L)
  }

  test("torn manifest (missing end trailer) is ignored and healed") {
    val outPath = Files.createTempDirectory("graft_om_torn").toString + "/packed"
    land(outPath, 0); OutputCompaction.compact(spark, outPath, upTo = 0)
    val expected = docIds(outPath)
    val whole = manifestText(outPath)
    val torn = whole.linesWithSeparators.toSeq.dropRight(1).mkString
    writeManifestText(outPath, torn)
    assert(docIds(outPath) == expected, "a torn manifest must read as absent")
    assert(manifestText(outPath) == whole, "the torn file must be healed in place")
    // garbage survives the same way
    writeManifestText(outPath, "not a manifest at all\n")
    assert(docIds(outPath) == expected)
    assert(manifestText(outPath) == whole)
  }

  test("full/merged_from round-trip: manifest-served visibility equals meta-served") {
    val outPath = Files.createTempDirectory("graft_om_claims").toString + "/packed"
    // two minors, then a tier merge that claims them
    land(outPath, 0); OutputCompaction.compact(spark, outPath, upTo = 0)
    land(outPath, 1); OutputCompaction.compact(spark, outPath, upTo = 1)
    OutputCompaction.mergeTiers(spark, outPath, ratio = 2, minMerge = 2)
    val expected = docIds(outPath)
    val healed = manifestText(outPath)
    // deterministic layout: minors v1/v2 merged into v3, full (it merged
    // every visible segment), claiming both inputs
    assert(healed.linesIterator.contains("seg 3 1 true 1,2"),
      s"the merged segment's claims/full flag must reach the manifest:\n$healed")

    // meta-served truth (manifest absent) must equal manifest-served
    val f = IndexFiles.fs(spark, outPath)
    f.delete(manifest(outPath), false)
    val metaServed = docIds(outPath) // also re-heals
    assert(metaServed == expected)
    assert(manifestText(outPath) == healed,
      "healing from metas must reproduce the identical manifest")
    val manifestServed = docIds(outPath)
    assert(manifestServed == expected)
  }
}
