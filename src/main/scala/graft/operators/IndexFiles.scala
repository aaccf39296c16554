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

  /** The fully-qualified URI of `path` on its own filesystem —
    * scheme+authority+path, so two paths compare equal only when they
    * name the same object on the same store. */
  def qualified(spark: SparkSession, path: String): String = {
    val u = fs(spark, path).makeQualified(new Path(path)).toUri
    // render scheme://authority/path by component: URIs with a NULL
    // authority print "file:/x" while an EMPTY authority prints
    // "file:///x" — the same object, two strings, a false mismatch
    s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
      .stripSuffix("/")
  }

  /** The commit marker a manifest-committed directory carries
    * ([[publish]] writes it LAST into the tmp dir; Spark's own parquet
    * committer writes `_SUCCESS` at job commit) — what [[numbered]]
    * demands before exposing a directory to readers. */
  private[graft] val ManifestFile = "_manifest"

  /** Final (non-`.tmp`) child directories of `path` named `<prefix><id>`,
    * as `(id, path)` ascending by id. A missing root lists empty; foreign
    * children (wrong prefix, non-numeric suffix) are skipped, not errors.
    *
    * MANIFEST-COMMIT: a directory is listed only once its commit marker
    * exists — `_manifest` (written last by [[publish]]) or `_SUCCESS`
    * (Spark's job-commit marker on directly-written parquet dirs, e.g.
    * the daemons' `ingest_batch=<id>` landings). On stores whose rename
    * is copy-then-delete (S3-style), a half-copied directory therefore
    * stays invisible until the marker — the LAST object written — lands;
    * rename-atomic stores never expose partials anyway. */
  def numbered(spark: SparkSession, path: String, prefix: String): Seq[(Long, Path)] = {
    val root = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && !n.endsWith(".tmp") &&
            (f.exists(new Path(st.getPath, ManifestFile)) ||
             f.exists(new Path(st.getPath, "_SUCCESS"))))
          n.stripPrefix(prefix).toLongOption.map(_ -> st.getPath)
        else None
      }
      .sortBy(_._1)
  }

  /** Publish the fully-written `tmp` directory as `dest` — MANIFEST-LAST
    * commit, safe on stores with AND without atomic rename:
    *
    *   1. re-check the in-JVM writer lease on any enclosing fenced path
    *      (narrowing the check-then-mutate window — a writer fenced
    *      mid-batch fails here instead of landing its in-flight artifact);
    *   2. rename `tmp` → `dest` WITHOUT its commit marker. On HDFS-like
    *      stores the rename is atomic; on copy-then-delete stores a
    *      half-copied `dest` may be listable — but [[numbered]] refuses
    *      unmarked directories, so readers ignore it either way;
    *   3. create `dest/_manifest` — one single-object write, the atomic
    *      commit point on every store.
    *
    * A crash between 2 and 3 leaves an unmarked `dest` no reader sees;
    * the next publish of the same version deletes and rewrites it (the
    * version allocator in each writer reads [[numbered]]'s max, which
    * ignores the unmarked leftover — single-writer paths re-allocate the
    * same number). */
  def publish(spark: SparkSession, tmp: String, dest: String): Unit = {
    val f = fs(spark, tmp)
    val tm = new Path(tmp, ManifestFile)
    if (f.exists(tm)) f.delete(tm, false) // marker never rides the rename
    checkLeasesCovering(spark, dest)
    val d = new Path(dest)
    if (f.exists(d)) f.delete(d, true)
    require(f.rename(new Path(tmp), d), s"publish rename failed: $tmp -> $dest")
    val o = f.create(new Path(d, ManifestFile), true)
    o.close()
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Numbered claim FILES `<prefix><id>` under `path`, ascending — the
    * writer-lease listing ([[numbered]]'s file twin; leases are files, not
    * directories, because the claim primitive is create-if-absent). */
  private def numberedClaims(spark: SparkSession, path: String,
      prefix: String): Seq[(Long, Path)] = {
    val root = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq
      .filter(_.isFile)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && !n.endsWith(".tmp"))
          n.stripPrefix(prefix).toLongOption.map(_ -> st.getPath)
        else None
      }
      .sortBy(_._1)
  }

  /** WRITER FENCING for the LSM index paths — turns the documented
    * single-writer contract into fail-fast. Two daemons pointed at one
    * index path would otherwise claim the same `delta_<N>` number and
    * corrupt the chain SILENTLY (an ops accident, not an exotic failure,
    * in any HA deployment). The classic fencing-token design:
    *
    *   - [[claimWriter]] claims the next epoch by atomic create-if-absent
    *     of `path/_writer/epoch_<E>` — underscore-prefixed so the lease is
    *     invisible to Spark partition discovery even under a parquet-read
    *     root (the daemons fence their `--out` paths too). Two claimants
    *     of the same E: exactly one create succeeds; the loser retries
    *     at E+1;
    *   - [[WriterLease.check]] (called by every ingest gate before any
    *     mutation — staging, fold, delta write, compaction, maintenance)
    *     demands the path's HIGHEST epoch still be this writer's: a newer
    *     claim means another writer owns the path now, and this one dies
    *     loudly instead of interleaving delta numbers with it;
    *   - a CRASHED writer needs no cleanup — the next writer simply claims
    *     the next epoch (stale leases fence nothing; superseded claim
    *     files are pruned on claim).
    *
    * Latest-claim-wins is the standard fencing direction (the new epoch
    * holder is the deployment's intended owner — a restart, a failover);
    * the fenced predecessor is the one that must stop. Readers need no
    * lease — loads are safe at any moment by the stamp/atomic-publish
    * rules.
    *
    * STRENGTH, honestly stated: the claim's atomicity is the store's
    * `create(overwrite = false)`. On HDFS that is a true atomic
    * create-if-absent; on the local filesystem it is check-then-create,
    * and on S3A the object only appears at close (no conditional-PUT
    * precondition rides through this API) — on such stores two claimants
    * CAN both believe they won the same epoch, so the fence there is
    * BEST-EFFORT: it converts the overwhelmingly common ops accident
    * (second daemon started seconds-to-minutes later — its claim lists
    * the first one's file and supersedes it) into a loud failure, but a
    * sub-visibility-window tie is not excluded. A hard guarantee needs
    * the store to validate the token itself (conditional PUT / a lock
    * service). Check-before-mutate also leaves a check-to-write window;
    * [[publish]] narrows it by re-checking the registered lease
    * immediately before the rename ([[checkLeasesCovering]]). */
  final class WriterLease private[IndexFiles] (spark: SparkSession,
      path: String, val epoch: Long) {
    /** Fail fast when a newer writer claimed the path. One listing per
      * call — cheap against a per-micro-batch cadence. */
    def check(): Unit = {
      val top = numberedClaims(spark, s"$path/_writer", "epoch_")
        .lastOption.map(_._1)
      if (!top.contains(epoch))
        throw new IllegalStateException(
          s"writer fenced at $path: this writer holds epoch $epoch but the " +
            s"latest claim is ${top.getOrElse(-1L)} — a newer writer owns " +
            "the path (two ingest daemons on one index path?)")
    }
  }

  /** In-JVM registry of the latest lease per fenced root (fully-qualified
    * URI → lease): lets [[publish]] re-check the owning lease at the last
    * moment without threading lease handles through every save path. Only
    * tracks THIS process's claims — exactly the writer whose in-flight
    * artifact the publish-time check should stop. */
  private val leases =
    new java.util.concurrent.ConcurrentHashMap[String, WriterLease]()

  /** Re-check every registered lease whose fenced root encloses `dest`
    * (fully-qualified prefix match, so scheme/authority differences never
    * cross-trip — the PinnedCaches qualification rule). */
  private def checkLeasesCovering(spark: SparkSession, dest: String): Unit = {
    val q = qualified(spark, dest)
    leases.forEach { (root, lease) =>
      if (q == root || q.startsWith(root + "/")) lease.check()
    }
  }

  /** Claim the writer lease on an index path (see [[WriterLease]]). */
  def claimWriter(spark: SparkSession, path: String,
      attempts: Int = 5): WriterLease = {
    val root = s"$path/_writer"
    val f = fs(spark, path)
    var n = attempts
    while (n > 0) {
      val e = numberedClaims(spark, root, "epoch_")
        .map(_._1).maxOption.getOrElse(0L) + 1
      try {
        // create-if-absent IS the atomic claim (overwrite = false); the
        // content is diagnostic only — epoch numbers carry the protocol
        val out = f.create(new Path(s"$root/epoch_$e"), false)
        try out.write(
          java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
        finally out.close()
        // prune superseded claims — their writers are fenced by this one
        numberedClaims(spark, root, "epoch_").filter(_._1 < e)
          .foreach { case (_, p) => if (f.exists(p)) { f.delete(p, false); () } }
        val lease = new WriterLease(spark, path, e)
        leases.put(qualified(spark, path), lease)
        return lease
      } catch {
        // FileAlreadyExistsException on modern Hadoop FS, bare IOException
        // on older local FS — either way: lost the race, retry above it
        // (a persistent real failure exhausts `attempts` and fails loudly)
        case _: java.io.IOException => n -= 1
      }
    }
    throw new IllegalStateException(
      s"could not claim a writer lease at $path after $attempts attempts")
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
