package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Registry for the operators' call-local cache pins (dup-group collapse,
  * shingle/fingerprint working sets, k-means assignments).
  *
  * Before this existed each operator call issued its own `.cache()`, and the
  * pins were released only by a full `catalog`-level cache clear — a
  * long-lived service invoking the operators repeatedly across corpora would
  * accumulate executor storage until that manual sweep. Centralizing the
  * pins here makes the lifecycle explicit ([[release]] drops exactly what
  * the operators pinned for a session, nothing else) and adds cross-call
  * reuse for free: the key is the frame's CANONICALIZED logical plan, so two
  * operator calls over the same input (minhash pairs and simhash pairs both
  * collapsing the same corpus, k-means and the cluster sampler sharing one
  * assignment) hit one materialization instead of pinning twins.
  */
object PinnedCaches {

  private val pinned =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, LogicalPlan), DataFrame]

  /** Cache-and-register `df`: returns the already-pinned frame for a
    * semantically equal plan in the same session, else caches this one and
    * tracks it for [[release]]. */
  def pin(df: DataFrame): DataFrame = {
    val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
    pinned.getOrElseUpdate(key, df.cache())
  }

  private val memos = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, LogicalPlan, String), DataFrame]

  /** Pin keyed by an INPUT frame + tag instead of the result's own plan —
    * for operators whose result embeds non-canonicalizable state (the
    * star-contraction CC loop ends in a `localCheckpoint` RDD, so two runs over
    * the same corpus produce plan-distinct results and [[pin]] alone can
    * never deduplicate them; worse, the loop is EAGER, so the work re-runs
    * before any cache lookup could hit). `build` runs once per (session,
    * canonicalized input plan, tag); the result is pinned and shared. */
  def memo(keyFrame: DataFrame, tag: String)(build: => DataFrame): DataFrame = {
    val key = (keyFrame.sparkSession, keyFrame.queryExecution.analyzed.canonicalized, tag)
    memos.getOrElseUpdate(key, pin(build))
  }

  /** Unpersist and forget ONE pin by its frame (index-lifecycle swaps drop
    * a superseded index's frames without sweeping the whole session). A
    * plan another operator still uses simply re-caches on its next call. */
  def unpin(df: DataFrame): Unit = {
    val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
    pinned.remove(key).foreach(_.unpersist())
  }

  /** Unpersist and forget every pin registered for `s` (called by
    * `SparkEntry.clearCaches`; safe to call between corpora). */
  def release(s: SparkSession): Unit = {
    memos.keys.filter(_._1 == s).foreach(memos.remove)
    pinned.keys.filter(_._1 == s).foreach { k =>
      pinned.remove(k).foreach(_.unpersist())
    }
  }

  /** Pin count for `s` — spec hook. */
  def size(s: SparkSession): Int = pinned.keys.count(_._1 == s)

  /** Root paths of every file relation a pinned plan reads — the input to
    * the MUTABLE-PATH PIN SWEEP ([[assertNoPinsUnder]]). */
  def pinnedSourcePaths(s: SparkSession): Set[String] =
    pinned.collect { case ((ss, _), df) if ss == s =>
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
    }.flatten.toSet

  /** The mutable-path pin INVARIANT, generalized from the VecIngest
    * daemon-maintenance bug: no pin may root a plan on (or under) a path a
    * daemon APPENDS to. The CacheManager substitutes cached plan FRAGMENTS
    * into semantically-equal subtrees of later plans, so a pin rooted on a
    * growing path serves a STALE snapshot (frozen at pin-time file
    * listing) into every identical future read — the retrain that
    * re-encoded only bootstrap-era rows. Operators may pin such reads
    * TRANSIENTLY (the PQ/graph bootstraps do) but must release before the
    * batch ends; daemons/specs call this at quiet points. Throws listing
    * the violations — the detector direction of the repo's plan bans. */
  def assertNoPinsUnder(s: SparkSession, mutablePath: String): Unit = {
    // FULLY-QUALIFIED comparison (scheme + authority + path): a bare-path
    // compare would falsely trip a pin on s3://bucketA/data against a
    // sweep of hdfs:///data, and a relative mutablePath would silently
    // never match the qualified pinned roots (ADVICE r12)
    val root = IndexFiles.qualified(s, mutablePath)
    val bad = pinnedSourcePaths(s).filter { p =>
      val q = IndexFiles.qualified(s, p)
      q == root || q.startsWith(root + "/")
    }
    if (bad.nonEmpty) throw new IllegalStateException(
      s"mutable-path pin violation: pinned plans root on the growing path " +
        s"$mutablePath: ${bad.mkString(", ")} — release the pin or read " +
        "through a checkpointed copy")
  }

  /** Stage timer for the cache warms — ONE format (`[warm] <label> <s> s`
    * on stderr) so the round-over-round cache_build drift adjudication
    * greps a single shape; shared by SparkEntry.warmCaches and the
    * families' warmPins. */
  /** Dev-only profiling switch (graft.WarmProfile): serialize the warm
    * chains/branches so each [[warmStage]] line times the stage's own
    * compute instead of its share of a saturated core pool. */
  private[graft] def warmSequential: Boolean =
    sys.env.get("GRAFT_WARM_SEQUENTIAL").contains("1")

  private[graft] def warmStage(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    System.err.println(
      f"[warm] $label ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
