package graft.operators

import org.apache.spark.sql.DataFrame

/** INDEX LIFECYCLE — the refresh-and-swap discipline that turns the
  * per-corpus retrieval/dedup artifacts ([[Dedup.corpusIndex]],
  * [[Similarity.embedIndex]]) into LIVING indexes a 100 TB ingest loop can
  * keep current:
  *
  *   - `fold(batch)` builds the refreshed index INCREMENTALLY (cost
  *     proportional to the batch — [[Dedup.refreshIndexTracked]] /
  *     [[Similarity.refreshEmbedIndexTracked]]), optionally persists the
  *     fold's O(batch) [[Dedup.IndexDelta]] (`deltaPath` —
  *     [[Dedup.saveIndexDelta]]; a restart [[Dedup.loadIndex]]es base +
  *     deltas instead of rebuilding), checkpoint-materializes the published
  *     components, and only then publishes through one volatile write — a
  *     concurrent reader (a streaming micro-batch gating against
  *     [[current]]) either sees the complete old index or the complete new
  *     one, never a half-built frame set;
  *   - every fold-local frame (intermediates AND the pre-checkpoint
  *     published components) is a tracked `persist` dropped right after the
  *     checkpoint, and the superseded index releases after the swap —
  *     executor storage AND driver references stay bounded at ~one index,
  *     not one per refresh (pinning the intermediates would root them in
  *     the PinnedCaches TrieMap forever; spec-pinned by the storage-bound
  *     lifecycle test);
  *   - refreshed ≡ from-scratch is the spec'd contract: the folded index's
  *     fps/sets/buckets (resp. qc/cb) contents and the gate decisions equal
  *     a from-scratch build over the union corpus (IndexLifecycleSpec; the
  *     `dedup_index_refresh` / `embed_index_refresh` registry rows pin the
  *     gate output against the DuckDB oracle on a 3-way corpus split, and
  *     `dedup_index_delta` / `embed_index_delta` pin it through the
  *     persisted base+delta round trip).
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
    * base and lose one batch. When `deltaPath` is set, the fold's O(batch)
    * delta lands there BEFORE the swap ([[Dedup.saveIndexDelta]] is
    * content-idempotent under replay: re-folding already-indexed docs
    * yields an empty-fresh delta). Returns the published index. */
  def fold(newDocs: DataFrame, releaseOld: Boolean = true,
      deltaPath: Option[String] = None): Dedup.CorpusIndex =
    synchronized {
      val (refreshed, delta, dropFoldCaches) = Dedup.refreshIndexTracked(idx, newDocs)
      deltaPath.foreach(p => Dedup.saveIndexDelta(delta, p))
      // truncated(): materializes eagerly AND bounds plan depth — without
      // it a per-batch fold loop nests each index's plans inside the next
      // (the closed ingest gate OOM'd on plan strings by batch 2)
      val next = refreshed.truncated()
      dropFoldCaches()
      val prev = idx
      idx = next
      if (releaseOld) prev.release()
      next
    }
}

/** The kNN GRAPH under the same refresh-and-swap discipline — the graph is
  * a per-corpus index artifact ([[Similarity.knnGraphIndex]]), and its
  * consumers ([[Similarity.pageRankOver]],
  * [[Similarity.qualityPropagationOver]]) must never traverse a stale graph
  * after the corpus they rank refreshed. `fold` is the INCREMENTAL path
  * ([[Similarity.refreshKnnGraph]] — frozen centroids, new-node edges plus
  * affected-node re-rank, ≡ from-scratch under the same codebook,
  * spec-pinned); rebuild-and-swap for codebook retraining is
  * [[rebuildWith]]. */
final class RefreshableKnnGraph(initial: Similarity.KnnGraphIndex) {
  @volatile private var g: Similarity.KnnGraphIndex = initial.materialize()

  def current: Similarity.KnnGraphIndex = g

  /** Fold `newVecs` in under the frozen centroids and atomically publish. */
  def fold(newVecs: DataFrame, releaseOld: Boolean = true): Similarity.KnnGraphIndex =
    synchronized {
      val (refreshed, dropFoldCaches) = Similarity.refreshKnnGraphTracked(g, newVecs)
      val next = refreshed.truncated()
      dropFoldCaches()
      val prev = g
      g = next
      if (releaseOld) prev.release()
      next
    }

  /** Swap in a from-scratch rebuild (new codebook — the retrain escape
    * when the frozen centroids have drifted from the corpus). */
  def rebuildWith(rebuilt: Similarity.KnnGraphIndex,
      releaseOld: Boolean = true): Similarity.KnnGraphIndex =
    synchronized {
      val next = rebuilt.truncated()
      val prev = g
      g = next
      if (releaseOld) prev.release()
      next
    }
}

/** The learned-PQ index under the swap discipline — the codebook-drift
  * lifecycle ([[Similarity.PqIndex]]'s scaladoc documents the policy):
  * [[append]] is the routine frozen-codebook ingest; [[retrain]] trains a
  * fresh codebook over the given (refreshed) corpus, re-encodes, bumps the
  * version, and swaps. Drift is observed through
  * [[Similarity.pqRecall]](current) on a monitoring cadence — PqDriftSpec
  * pins the whole story: a shifted batch degrades recall@k under the
  * frozen codebook and retrain-and-swap recovers it. */
final class RefreshablePqIndex(initial: Similarity.PqIndex) {
  @volatile private var idx: Similarity.PqIndex = initial.materialize()

  def current: Similarity.PqIndex = idx

  /** Frozen-codebook append-encode of a new batch (O(batch)). */
  def append(newVecs: DataFrame, releaseOld: Boolean = true): Similarity.PqIndex =
    synchronized {
      val (refreshed, dropFoldCaches) = Similarity.appendEncodePqTracked(idx, newVecs)
      val next = refreshed.truncated()
      dropFoldCaches()
      val prev = idx
      idx = next
      if (releaseOld) prev.release()
      next
    }

  /** Retrain over `corpus` (the full refreshed population), re-encode,
    * version-bump, swap. */
  def retrain(corpus: DataFrame, releaseOld: Boolean = true): Similarity.PqIndex =
    synchronized {
      val rebuilt = Similarity.retrainPqIndex(corpus, idx)
      val next = rebuilt.truncated()
      rebuilt.release()
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

  def fold(newVecs: DataFrame, releaseOld: Boolean = true,
      deltaPath: Option[String] = None): Similarity.EmbedIndex =
    synchronized {
      val (refreshed, delta, dropFoldCaches) = Similarity.refreshEmbedIndexTracked(idx, newVecs)
      deltaPath.foreach(p => Similarity.saveEmbedIndexDelta(delta, p))
      val next = refreshed.truncated()
      dropFoldCaches()
      val prev = idx
      idx = next
      if (releaseOld) prev.release()
      next
    }
}
