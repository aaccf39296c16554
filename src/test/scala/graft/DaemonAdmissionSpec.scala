package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.operators.IndexFiles
import graft.streaming.{OutputCompaction, StreamingCuration}

/** Admission control for the parquet-source daemons: the tail sources have
  * `maxBytesPerTrigger`; without a file-count cap, Ingest/VecIngest drain a
  * cold `--src` backlog in ONE giant micro-batch (a month of crawl output
  * as one batch's working set). `--max-files-per-trigger` bounds each
  * micro-batch while `--once` (AvailableNow) still drains the whole
  * backlog — one `ingest_batch=<id>` landing per bounded step. */
class DaemonAdmissionSpec extends SparkSpec {

  private def writeOneFile(df: DataFrame, srcDir: String, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_adm").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(srcDir))
    Files.copy(part.toPath, Paths.get(srcDir, name))
    ()
  }

  test("Ingest: a cold 3-file backlog drains in 3 bounded batches, not one") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_adm_ing").toString
    val config = Ingest.Config(src = s"$root/src", out = s"$root/out",
      checkpoint = s"$root/ckpt", once = true, maxFilesPerTrigger = Some(1))
    val docs = graft.operators.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text", "source", "n_chars").filter(col("doc_id") < 90)
    (0 until 3).foreach { k =>
      writeOneFile(docs.filter(col("doc_id") >= k * 30 && col("doc_id") < (k + 1) * 30),
        config.src, s"f$k.parquet")
    }
    val q = StreamingCuration.ingestTo(spark, Ingest.source(spark, config),
      config.out, config.checkpoint, availableNow = true)
    assert(q.awaitTermination(180000L))
    val dirs = IndexFiles.numbered(spark, config.out, OutputCompaction.BatchPrefix)
    assert(dirs.size == 3,
      s"one bounded batch per file, got ${dirs.size} (${dirs.map(_._1)})")
    // the bounded drain still lands the whole (curated, id-ordered) backlog
    val expected = graft.operators.CurationPipeline.e2e(docs).count()
    assert(expected > 0 &&
      OutputCompaction.read(spark, config.out).count() == expected)
    IndexFiles.delete(spark, root)
  }

  test("VecIngest: same bounded cold-start drain through its own source") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_adm_vec").toString
    val c = VecIngest.Config(src = s"$root/src", out = s"$root/out",
      checkpoint = s"$root/ckpt", index = s"$root/embed",
      maxFilesPerTrigger = Some(1), once = true)
    (0 until 3).foreach { k =>
      writeOneFile(
        (k * 10L until k * 10L + 4L).map { i =>
          val a = Array.tabulate(16)(d =>
            if (d == (8 * k + (i % 4)).toInt % 16) 0.9f else 0.001f * (i % 3))
          (i, a.toSeq, k)
        }.toDF("vec_id", "embedding", "label"),
        c.src, s"v$k.parquet")
    }
    val (q, pipe) = VecIngest.ingestTo(spark, VecIngest.source(spark, c), c)
    assert(q.awaitTermination(180000L))
    pipe.flush()
    val dirs = IndexFiles.numbered(spark, c.out, OutputCompaction.BatchPrefix)
    assert(dirs.size == 3,
      s"one bounded batch per file, got ${dirs.size} (${dirs.map(_._1)})")
    IndexFiles.delete(spark, root)
  }

  test("flag parsing carries the cap on both daemons") {
    val i = Ingest.parseArgs(Seq("--src", "/in", "--out", "/o",
      "--checkpoint", "/c", "--max-files-per-trigger", "4",
      "--out-merge-ratio", "8", "--out-merge-min", "9"))
    assert(i.maxFilesPerTrigger.contains(4) && i.outMergeRatio == 8 &&
      i.outMergeMin == 9)
    assert(VecIngest.parseArgs(Seq("--src", "/i", "--out", "/o",
      "--checkpoint", "/c", "--index", "/x", "--out-merge-min", "6"))
      .outMergeMin == 6)
    val v = VecIngest.parseArgs(Seq("--src", "/in", "--out", "/o",
      "--checkpoint", "/c", "--index", "/idx", "--max-files-per-trigger", "2"))
    assert(v.maxFilesPerTrigger.contains(2))
    // unset -> engine default (one big drain) — the knob is opt-in
    assert(Ingest.parseArgs(Seq("--src", "/in", "--out", "/o",
      "--checkpoint", "/c")).maxFilesPerTrigger.isEmpty)
  }
}
