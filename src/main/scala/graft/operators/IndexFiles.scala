package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FS plumbing shared by the corpus/embed index persistence
  * ([[Dedup.saveIndex]]/[[Similarity.saveEmbedIndex]], their delta forms,
  * and the ingest gates' durable staging): numbered-directory listing
  * (`base_v<V>` / `delta_<N>` / `batch=<B>`), atomic tmp-then-rename
  * publication, recursive delete. Everything goes through the path's own
  * `FileSystem`, never `java.io.File` — these artifacts live on
  * `s3a://`-like stores in a real deployment. */
private[graft] object IndexFiles {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Final (non-`.tmp`) child directories of `path` named `<prefix><id>`,
    * as `(id, path)` ascending by id. A missing root lists empty; foreign
    * children (wrong prefix, non-numeric suffix) are skipped, not errors. */
  def numbered(spark: SparkSession, path: String, prefix: String): Seq[(Long, Path)] = {
    val root = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && !n.endsWith(".tmp"))
          n.stripPrefix(prefix).toLongOption.map(_ -> st.getPath)
        else None
      }
      .sortBy(_._1)
  }

  /** Atomically publish the fully-written `tmp` directory as `dest`
    * (directory rename — the atomic unit on HDFS-like stores; a reader
    * never sees a half-written numbered directory because `.tmp` names are
    * excluded from [[numbered]]). */
  def publish(spark: SparkSession, tmp: String, dest: String): Unit = {
    val f = fs(spark, tmp)
    val d = new Path(dest)
    if (f.exists(d)) f.delete(d, true)
    require(f.rename(new Path(tmp), d), s"atomic publish failed: $tmp -> $dest")
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Run independent Spark actions concurrently and return their results
    * in order — the index save/materialize paths are 3–7 embarrassingly-
    * parallel component jobs (distinct output dirs / distinct cached
    * frames), and running them sequentially serializes each job's fixed
    * scheduling overhead (the dominant cost of a small-component write).
    * Spark's scheduler is designed for multi-threaded job submission; the
    * first failure propagates. */
  def inParallel[A](work: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.traverse(work)(w => Future(w())), Duration.Inf)
  }
}
