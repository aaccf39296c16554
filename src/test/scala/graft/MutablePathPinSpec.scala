package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.{IndexFiles, PinnedCaches}
import graft.streaming.StreamingCuration

/** The mutable-path pin sweep — the generalized invariant behind the r11
  * VecIngest bug (a pqIndexBuild pin rooted on the growing `--out` path
  * made the CacheManager substitute a bootstrap-era snapshot into the
  * identical retrain plan): after any daemon batch completes, NO pin may
  * root a plan on or under a path that daemon appends to. Detector
  * self-check first (the repo's plan-ban pattern), then the audit over
  * both daemons' real pipelines. */
class MutablePathPinSpec extends SparkSpec {

  test("detector self-check: a deliberate pin on a growing path is flagged, then released") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pinsweep").toString + "/out"
    Seq((1L, "x")).toDF("id", "v").write.mode("overwrite")
      .parquet(s"$dir/ingest_batch=0")
    PinnedCaches.assertNoPinsUnder(spark, dir) // clean before
    val pinnedFrame = PinnedCaches.pin(spark.read.parquet(s"$dir/ingest_batch=0"))
    val ex = intercept[IllegalStateException] {
      PinnedCaches.assertNoPinsUnder(spark, dir)
    }
    assert(ex.getMessage.contains("mutable-path pin violation"), ex.getMessage)
    // scheme-normalized matching: the pinned root is file:-prefixed
    assert(PinnedCaches.pinnedSourcePaths(spark).exists(_.contains("ingest_batch=0")))
    PinnedCaches.unpin(pinnedFrame)
    PinnedCaches.assertNoPinsUnder(spark, dir) // released = clean again
    IndexFiles.delete(spark, dir)
  }

  test("VecIngest: no pin outlives a batch on the growing --out path (incl. PQ/graph bootstraps)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_pinsweep_vec").toString
    val c = VecIngest.Config(src = s"$root/src", out = s"$root/out",
      checkpoint = s"$root/ckpt", index = s"$root/embed",
      pqIndex = Some(s"$root/pq"), graphIndex = Some(s"$root/graph"),
      centroidMod = 13, maintainEvery = 1, maintainFloor = 0.0, once = true)
    def vecs(lo: Long, block: Int): DataFrame =
      (lo until lo + 5).map { i =>
        val a = Array.fill(64)(0.001f * (i % 3))
        (0 until 8).foreach(j => a(block + j) = 0.7f + 0.01f * ((i + j) % 5))
        (i, a.toSeq, block)
      }.toDF("vec_id", "embedding", "label")

    val pipe = new VecIngest.Pipeline(spark, c)
    pipe.onBatch(vecs(0, 0), 0) // bootstraps PQ + graph over the landed corpus
    PinnedCaches.assertNoPinsUnder(spark, c.out)
    pipe.onBatch(vecs(100, 8), 1) // folds batch 0, runs the maintenance monitors
    PinnedCaches.assertNoPinsUnder(spark, c.out)
    pipe.flush()
    PinnedCaches.assertNoPinsUnder(spark, c.out)
    IndexFiles.delete(spark, root)
  }

  test("Ingest: no pin outlives a batch on the growing output (near-gate bootstrap included)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_pinsweep_ing").toString
    val out = s"$root/packed"
    val gate = Ingest.nearGate(spark, Ingest.Config(src = "x", out = "x",
      checkpoint = "x", nearIndex = Some(s"$root/near")))
    val run = new StreamingCuration.CurationRun(spark, out, budget = 8L,
      nearGate = gate,
      statsPath = None, statsCompactEvery = 0, outCompactEvery = 1)
    def docsDf(lo: Long) =
      (lo until lo + 3).map(i =>
        (i, (0 until 12).map(w => s"tok${i}_$w").mkString(" "), "web", 30L))
        .toDF("doc_id", "text", "source", "n_chars")
    run.onBatch(docsDf(0), 0)
    PinnedCaches.assertNoPinsUnder(spark, out)
    run.onBatch(docsDf(10), 1)
    PinnedCaches.assertNoPinsUnder(spark, out)
    gate.foreach(_.flush())
    PinnedCaches.assertNoPinsUnder(spark, out)
    IndexFiles.delete(spark, root)
  }
}
