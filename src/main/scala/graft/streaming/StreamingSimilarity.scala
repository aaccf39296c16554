package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

/** Streaming embedding-ingest novelty — the vector twin of
  * [[StreamingDedup.novelNearCorpus]]: embeddings arrive as a stream (an
  * encoder emitting vectors for freshly crawled documents) and each is
  * admitted only if it has no corpus match at the cosine threshold.
  *
  * Same architecture and for the same reason: the gate returns the
  * per-micro-batch transform for `DataStreamWriter.foreachBatch` rather
  * than a stream-native plan — the best-match fold is an aggregation, and
  * a streaming aggregation would accrete state per vector forever; as a
  * `foreachBatch` body the whole gate is stateless joins against the
  * PINNED corpus LSH index ([[Similarity.embedIndex]], built once here at
  * closure creation, never per batch) plus a batch-local fold, so state is
  * ZERO regardless of stream length and per-batch cost is proportional to
  * the BATCH. Restart semantics are `foreachBatch`'s exactly-once batch
  * replay; the sink must be idempotent per (batchId, vec_id).
  *
  * In-stream duplicates are not matched against each other (the same
  * contract as the text gate — compose an upstream
  * [[StreamingDedup.firstOccurrences]]-style pass on a vector fingerprint
  * when the stream itself must collapse).
  *
  * Proven equivalent to [[Similarity.embedNovelty]] on a parity-split
  * corpus, across a kill/restart, in StreamingDedupSpec. */
object StreamingSimilarity {

  def novelAgainstIndex(corpus: DataFrame, threshold: Double = 0.35,
      bucketCap: Int = graft.operators.Dedup.DefaultBucketCap): DataFrame => DataFrame = {
    val idx = Similarity.embedIndex(corpus, bucketCap)
    batch => Similarity.embedNoveltyAgainst(batch, idx, threshold)
  }

  /** The vector side of the CLOSED ingest loop
    * ([[StreamingDedup.novelNearCorpusIngest]]'s twin): gate each
    * micro-batch against the living embed index and fold the admitted
    * (novel) vectors back in, LAGGED one batch — batch N's admissions fold
    * at the start of batch N+1, so a replay of N gates against exactly the
    * index N saw first. Same crash honesty as the text form: the staged
    * batch is driver-memory, so a crash between N's commit and N+1 loses
    * N's fold (copies re-admit, at-least-once on novelty; persist the
    * index per fold to close the window). */
  def novelAgainstIndexIngest(ref: graft.operators.RefreshableEmbedIndex,
      threshold: Double = 0.35): DataFrame => DataFrame = {
    val pending = new java.util.concurrent.atomic.AtomicReference[Option[DataFrame]](None)
    batch => {
      pending.getAndSet(None).foreach { p =>
        ref.fold(p)
        p.unpersist()
      }
      val decisions = Similarity.embedNoveltyAgainst(batch, ref.current, threshold)
      val admitted = batch.join(
        decisions.filter(org.apache.spark.sql.functions.col("novel"))
          .select("vec_id"), Seq("vec_id"))
        .persist()
      if (admitted.count() > 0) pending.set(Some(admitted))
      else admitted.unpersist()
      decisions
    }
  }
}
