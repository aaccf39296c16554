package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IndexFiles, Layout, Tables}
import graft.streaming.{OutputCompaction, StreamingCuration}

/** `--layout zorder:<k1>,<k2>` on the curation ingest: the landed (and
  * compacted) packed output carries parquet file min/max stats that prune
  * 2-D box predicates — the ScaleTechniquesSpec pruning argument, proven
  * over the files the DAEMON actually writes. The box every training-data
  * reader runs: one doc-id slice across all token offsets (resume a
  * shard / inspect a document range). */
class IngestLayoutSpec extends SparkSpec {

  test("flag parsing: zorder keys parse, malformed layouts fail loudly") {
    val c = Ingest.parseArgs(Seq("--src", "/i", "--out", "/o", "--checkpoint", "/c",
      "--layout", "zorder:doc_id,tok_offset"))
    assert(c.layout.contains(("doc_id", "tok_offset")))
    intercept[IllegalArgumentException] {
      Ingest.parseArgs(Seq("--src", "/i", "--out", "/o", "--checkpoint", "/c",
        "--layout", "hilbert:a,b"))
    }
    intercept[IllegalArgumentException] {
      Ingest.parseArgs(Seq("--src", "/i", "--out", "/o", "--checkpoint", "/c",
        "--layout", "zorder:only_one"))
    }
  }

  test("z-ordered ingest output: a doc-id box touches fewer files than the unordered landing") {
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text", "source", "n_chars")
    val root = Files.createTempDirectory("graft_inglay").toString
    val zOut = s"$root/z"; val plainOut = s"$root/plain"

    def drive(out: String, layoutFn: Option[DataFrame => DataFrame]): Unit = {
      // budget 8 spreads offsets; outCompactEvery 1 proves the layout
      // SURVIVES compaction (per-batch clustering alone would be lost at
      // the first fold)
      val run = new StreamingCuration.CurationRun(spark, out, budget = 8L,
        nearGate = None,
        statsPath = None, statsCompactEvery = 0, outCompactEvery = 1,
        telemetry = None, layoutFn = layoutFn)
      run.onBatch(docs, 0)
    }
    drive(zOut, Some(df =>
      Layout.zOrderByNormalized(df, col("doc_id"), col("tok_offset"), partitions = 8)))
    drive(plainOut, None)

    // per-FILE min/max stats — exactly what a parquet reader prunes on
    def fileStats(out: String) = {
      val base = IndexFiles.numbered(spark, out, OutputCompaction.BasePrefix).last._2
      spark.read.parquet(s"$base/data")
        .withColumn("f", input_file_name())
        .groupBy("f").agg(
          min("doc_id").as("d_lo"), max("doc_id").as("d_hi"),
          min("tok_offset").as("t_lo"), max("tok_offset").as("t_hi"))
        .collect()
    }
    val z = fileStats(zOut); val plain = fileStats(plainOut)
    assert(z.length > 2, s"need several z files to measure pruning (got ${z.length})")

    val landed = OutputCompaction.read(spark, zOut)
    val ids = landed.select(min("doc_id"), max("doc_id")).head()
    val (dMin, dMax) = (ids.getLong(0), ids.getLong(1))
    val dQuarter = dMin + (dMax - dMin) / 4
    def touched(stats: Array[org.apache.spark.sql.Row]): Int =
      stats.count(r => r.getAs[Long]("d_lo") <= dQuarter && r.getAs[Long]("d_hi") >= dMin)
    val zT = touched(z); val pT = touched(plain)
    assert(zT < z.length,
      s"the z layout must prune a doc-id box: touched $zT of ${z.length} files")
    assert(zT.toDouble / z.length < pT.toDouble / plain.length ||
      (pT == plain.length && zT < z.length),
      s"z must prune harder than the unordered landing: z $zT/${z.length} vs plain $pT/${plain.length}")

    // the layout changes FILE PLACEMENT only — contents stay identical
    val zSet = OutputCompaction.read(spark, zOut)
      .collect().map(_.toSeq).toSet
    val pSet = OutputCompaction.read(spark, plainOut)
      .collect().map(_.toSeq).toSet
    assert(zSet == pSet, "layout must never change the rows")
    IndexFiles.delete(spark, root)
  }
}
