package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.IndexFiles
import graft.streaming.OutputCompaction

/** MANIFEST-LAST publication (ADVICE/verdict r12 #6): IndexFiles.publish
  * previously relied on atomic directory rename — real on HDFS, a
  * copy-then-delete on S3-style stores, where a reader could list a
  * half-copied segment. The r13 protocol: a directory is COMMITTED only
  * by its marker (`_manifest`, written by publish as the LAST single
  * object; or Spark's own `_SUCCESS` on directly-written parquet dirs),
  * and every numbered-directory reader refuses unmarked directories.
  * These specs simulate the copy-then-delete world by writing segment
  * files individually with NO rename, exactly as the verdict prescribes. */
class ManifestCommitSpec extends SparkSpec {

  test("a copy-published (no-rename) segment stays invisible until its manifest lands") {
    import spark.implicits._
    val outPath = Files.createTempDirectory("graft_manifest").toString + "/packed"
    // one real batch dir + one real published segment
    Seq((1L, "keep")).toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$outPath/${OutputCompaction.BatchPrefix}0")
    OutputCompaction.compact(spark, outPath, upTo = 0)
    val settled = OutputCompaction.read(spark, outPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(settled == Set(1L))

    // SIMULATED S3-style publication of segment 9: write the data and
    // meta files individually into the FINAL location — no rename, no
    // manifest (the state a crashed copy-based publish leaves behind)
    val seg = s"$outPath/${OutputCompaction.BasePrefix}9"
    Seq((2L, "half-copied")).toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$seg/data")
    Seq((99L, false, Seq.empty[Long])).toDF("last_batch", "full", "merged_from")
      .coalesce(1).write.mode("overwrite").parquet(s"$seg/meta")

    // readers must ignore the unmarked directory entirely
    assert(IndexFiles.numbered(spark, outPath, OutputCompaction.BasePrefix)
      .forall(_._1 != 9L), "an unmanifested segment must not be listed")
    assert(OutputCompaction.read(spark, outPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet == settled,
      "reads must not see a half-published segment's rows")
    assert(OutputCompaction.highWater(spark, outPath) == 0L,
      "an unmanifested segment must not advance the replay stamp")

    // the manifest is the commit point: once it lands, the segment is real
    val f = IndexFiles.fs(spark, outPath)
    val o = f.create(new org.apache.hadoop.fs.Path(seg, "_manifest"), true)
    o.close()
    assert(IndexFiles.numbered(spark, outPath, OutputCompaction.BasePrefix)
      .exists(_._1 == 9L))
    assert(OutputCompaction.read(spark, outPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    IndexFiles.delete(spark, outPath)
  }

  test("publish itself writes the manifest last; a version with an unmarked leftover self-heals") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_manifest_pub").toString
    val path = s"$root/idx"
    // a normal publish carries the marker
    Seq((1L, "v1")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$path/delta_1.tmp/data")
    IndexFiles.publish(spark, s"$path/delta_1.tmp", s"$path/delta_1")
    val f = IndexFiles.fs(spark, path)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$path/delta_1/_manifest")))
    assert(IndexFiles.numbered(spark, path, "delta_").map(_._1) == Seq(1L))

    // crash between rename and manifest: delta_2 exists but is unmarked —
    // invisible, and the version allocator (numbered max + 1) re-allocates
    // 2, deleting the leftover on the way (publish self-heals)
    Seq((2L, "crashed")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$path/delta_2/data")
    f.delete(new org.apache.hadoop.fs.Path(s"$path/delta_2/data/_SUCCESS"), false)
    assert(IndexFiles.numbered(spark, path, "delta_").map(_._1) == Seq(1L),
      "the unmarked crash leftover must stay invisible")
    Seq((2L, "retried")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$path/delta_2.tmp/data")
    IndexFiles.publish(spark, s"$path/delta_2.tmp", s"$path/delta_2")
    assert(IndexFiles.numbered(spark, path, "delta_").map(_._1) == Seq(1L, 2L))
    assert(spark.read.parquet(s"$path/delta_2/data").select("v").head().getString(0)
      == "retried", "the retried publish must replace the crash leftover")
    IndexFiles.delete(spark, root)
  }

  test("publish re-checks the writer lease at the last moment (fenced mid-batch fails before landing)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_manifest_fence").toString
    val path = s"$root/idx"
    val lease = IndexFiles.claimWriter(spark, path)
    // a publish under the fenced path passes while the lease is current
    Seq((1L, "ok")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$path/delta_1.tmp/data")
    IndexFiles.publish(spark, s"$path/delta_1.tmp", s"$path/delta_1")
    lease.check()

    // another PROCESS claims the path (simulated by a direct claim file —
    // claimWriter here would re-register in this JVM's lease registry):
    // the in-flight publish must now fail AT PUBLISH TIME, even though
    // this writer's last explicit check() predates the fence
    val f = IndexFiles.fs(spark, path)
    val o = f.create(new org.apache.hadoop.fs.Path(s"$path/_writer/epoch_99"), false)
    o.close()
    Seq((2L, "in-flight")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$path/delta_2.tmp/data")
    val e = intercept[IllegalStateException](
      IndexFiles.publish(spark, s"$path/delta_2.tmp", s"$path/delta_2"))
    assert(e.getMessage.contains("fenced"),
      s"publish must re-check the lease before the rename: ${e.getMessage}")
    assert(IndexFiles.numbered(spark, path, "delta_").map(_._1) == Seq(1L),
      "the fenced writer's artifact must not have landed")
    IndexFiles.delete(spark, root)
  }
}
