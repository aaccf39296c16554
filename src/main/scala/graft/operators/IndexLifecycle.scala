package graft.operators

import org.apache.spark.sql.DataFrame

/** INDEX LIFECYCLE — the refresh-and-swap discipline that turns the
  * per-corpus retrieval/dedup artifacts ([[Dedup.corpusIndex]],
  * [[Similarity.embedIndex]]) into LIVING indexes a 100 TB ingest loop can
  * keep current:
  *
  *   - `fold(batch)` builds the refreshed index INCREMENTALLY (cost
  *     proportional to the batch — [[Dedup.refreshIndex]] /
  *     [[Similarity.refreshEmbedIndex]]), force-materializes every pinned
  *     component, and only then publishes it through one volatile write —
  *     a concurrent reader (a streaming micro-batch gating against
  *     [[current]]) either sees the complete old index or the complete new
  *     one, never a half-built frame set;
  *   - the superseded index's pins are released AFTER the swap (executor
  *     storage stays bounded at ~one index, not one per refresh);
  *   - refreshed ≡ from-scratch is the spec'd contract: the folded index's
  *     fps/sets/buckets (resp. qc/cb) contents and the gate decisions equal
  *     a from-scratch build over the union corpus (IndexLifecycleSpec; the
  *     `dedup_index_refresh` / `embed_index_refresh` registry rows pin the
  *     gate output against the DuckDB oracle on a 3-way corpus split).
  *
  * Readers hold the index VALUE they read, not the holder: a micro-batch
  * that read the old index mid-swap finishes against a consistent (merely
  * stale) index — the same monotonicity contract as any snapshot-isolated
  * index server. Released pins only unpersist cached frames; a reader still
  * executing against them recomputes from lineage, so staleness costs
  * speed, never correctness.
  */
final class RefreshableCorpusIndex(initial: Dedup.CorpusIndex) {
  @volatile private var idx: Dedup.CorpusIndex = initial.materialize()

  /** The currently-published index (complete by construction). */
  def current: Dedup.CorpusIndex = idx

  /** Fold `newDocs` in and atomically publish the refreshed index.
    * Synchronized: concurrent folders would otherwise both refresh the same
    * base and lose one batch. Returns the published index. */
  def fold(newDocs: DataFrame, releaseOld: Boolean = true): Dedup.CorpusIndex =
    synchronized {
      // truncated(): materializes eagerly AND bounds plan depth — without
      // it a per-batch fold loop nests each index's plans inside the next
      // (the closed ingest gate OOM'd on plan strings by batch 2)
      val next = Dedup.refreshIndex(idx, newDocs).truncated()
      val prev = idx
      idx = next
      if (releaseOld) prev.release()
      next
    }
}

/** [[RefreshableCorpusIndex]]'s vector-side twin over
  * [[Similarity.EmbedIndex]]. */
final class RefreshableEmbedIndex(initial: Similarity.EmbedIndex) {
  @volatile private var idx: Similarity.EmbedIndex = initial.materialize()

  def current: Similarity.EmbedIndex = idx

  def fold(newVecs: DataFrame, releaseOld: Boolean = true): Similarity.EmbedIndex =
    synchronized {
      val next = Similarity.refreshEmbedIndex(idx, newVecs).truncated()
      val prev = idx
      idx = next
      if (releaseOld) prev.release()
      next
    }
}
