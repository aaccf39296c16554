package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Beyond-reference training-data-pipeline operators (BASELINE.json north
  * star): dedup, similarity search, text analysis, multimodal columns.
  * Every operator here — including the sketch paths (minhash, simhash,
  * winnowing, sign-projection LSH, IVF) — uses engine-portable hashing
  * (md5-derived integers, universal affine permutations, mod-p rolling
  * hashes, embedded hyperplane literals), so each has a DuckDB oracle that
  * reproduces it hash-exactly; specs additionally cover recall vs brute
  * force and duplicate-heavy scaling.
  */
object DataPipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    "dedup_canonical" -> ((s, dir) => Dedup.canonical(docs(s, dir))),
    "corpus_report" -> ((s, dir) => Dedup.corpusReport(docs(s, dir))),
    "source_overlap" -> ((s, dir) => Dedup.sourceOverlap(docs(s, dir))),
    "dedup_jaccard_pairs" -> ((s, dir) => Dedup.jaccardPairs(docs(s, dir))),
    "dedup_prefix_join" -> ((s, dir) => Dedup.prefixJoinPairs(docs(s, dir))),
    "dedup_containment_pairs" -> ((s, dir) => Dedup.containmentPairs(docs(s, dir))),
    "dedup_minhash_pairs" -> ((s, dir) => Dedup.minhashPairs(docs(s, dir))),
    "dedup_clusters" -> ((s, dir) => Dedup.clusters(docs(s, dir))),
    "dedup_spans" -> ((s, dir) => Dedup.spans(docs(s, dir))),
    "dedup_spans_clean" -> ((s, dir) => Dedup.spansClean(docs(s, dir))),
    "dedup_incremental" -> ((s, dir) => Dedup.incremental(docs(s, dir))),
    // the indexed novelty gate (streaming twin's core) on the same parity
    // split as dedup_incremental — must produce identical rows, and shares
    // its oracle
    "dedup_novelty_gate" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val d = docs(s, dir)
      val idx = Dedup.corpusIndex(d.filter(pmod(col("doc_id"), lit(2)) === 0))
      Dedup.bestMatchAgainst(d.filter(pmod(col("doc_id"), lit(2)) === 1), idx)
        .orderBy("doc_id")
    }),
    // INDEX LIFECYCLE: corpus %3==0 indexed from scratch, %3==1 folded in
    // via the incremental refresh, %3==2 gated through the REFRESHED index
    // — the oracle knows only the union corpus, so the hash gate proves
    // refreshed ≡ from-scratch on the real corpus
    "dedup_index_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val d = docs(s, dir)
      val idx0 = Dedup.corpusIndex(d.filter(pmod(col("doc_id"), lit(3)) === 0))
      val idx1 = Dedup.refreshIndex(idx0, d.filter(pmod(col("doc_id"), lit(3)) === 1))
      Dedup.bestMatchAgainst(d.filter(pmod(col("doc_id"), lit(3)) === 2), idx1)
        .orderBy("doc_id")
    }),
    // DELTA-STRUCTURED PERSISTENCE: the same 3-way lifecycle split as
    // dedup_index_refresh, but routed THROUGH the persisted artifact — base
    // snapshot saved, reloaded, folded with an O(batch) delta write,
    // reloaded again (base + delta replay), then %3==2 gated through the
    // RELOADED index. Shares the refresh oracle: the DuckDB side knows only
    // the union corpus, so the hash gate proves base+delta load ≡
    // from-scratch. The gate output is checkpoint-materialized before the
    // scratch files are deleted.
    "dedup_index_delta" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val d = docs(s, dir)
      val path = java.nio.file.Files.createTempDirectory("graft-didx").toString
      Dedup.saveIndex(Dedup.corpusIndex(d.filter(pmod(col("doc_id"), lit(3)) === 0)), path)
      // fold the batch and persist ONLY its O(batch) delta — the in-memory
      // refreshed index is deliberately discarded: the RELOAD over
      // base+delta is the artifact this row gates through (the in-memory
      // swap path is dedup_index_refresh's row and IndexDeltaSpec)
      val loaded = Dedup.loadIndex(s, path)
      val (_, delta, dropFoldCaches) =
        Dedup.refreshIndexTracked(loaded, d.filter(pmod(col("doc_id"), lit(3)) === 1))
      Dedup.saveIndexDelta(delta, path)
      dropFoldCaches()
      loaded.release()
      // pin = false: reloaded is immediately checkpointed and discarded
      val reloaded = Dedup.loadIndex(s, path, pin = false)
      val pinned = reloaded.truncated()
      reloaded.release()
      IndexFiles.delete(s, path)
      Dedup.bestMatchAgainst(d.filter(pmod(col("doc_id"), lit(3)) === 2), pinned)
        .orderBy("doc_id")
    }),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(docs(s, dir))),
    "dedup_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir))),
    "embed_cosine_pairs" -> ((s, dir) => Similarity.cosinePairs(emb(s, dir))),
    "embed_lsh_pairs" -> ((s, dir) => Similarity.lshCosinePairs(emb(s, dir))),
    "embed_clusters" -> ((s, dir) => Similarity.embedClusters(emb(s, dir))),
    // the vector-ingest novelty gate on the parity split (odd ids = the
    // arriving batch, even = the indexed corpus)
    "embed_novelty_gate" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val e = emb(s, dir)
      Similarity.embedNovelty(e.filter(pmod(col("vec_id"), lit(2)) === 1),
        e.filter(pmod(col("vec_id"), lit(2)) === 0))
    }),
    // the vector-side index lifecycle on the same 3-way split
    "embed_index_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val e = emb(s, dir)
      val idx0 = Similarity.embedIndex(e.filter(pmod(col("vec_id"), lit(3)) === 0))
      val idx1 = Similarity.refreshEmbedIndex(idx0, e.filter(pmod(col("vec_id"), lit(3)) === 1))
      Similarity.embedNoveltyAgainst(e.filter(pmod(col("vec_id"), lit(3)) === 2), idx1)
    }),
    // the vector-side delta persistence round trip (dedup_index_delta's twin)
    "embed_index_delta" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val e = emb(s, dir)
      val path = java.nio.file.Files.createTempDirectory("graft-eidx").toString
      Similarity.saveEmbedIndex(
        Similarity.embedIndex(e.filter(pmod(col("vec_id"), lit(3)) === 0)), path)
      val loaded = Similarity.loadEmbedIndex(s, path)
      val (_, delta, dropFoldCaches) = Similarity.refreshEmbedIndexTracked(
        loaded, e.filter(pmod(col("vec_id"), lit(3)) === 1))
      Similarity.saveEmbedIndexDelta(delta, path)
      dropFoldCaches()
      loaded.release()
      // pin = false: reloaded is immediately checkpointed and discarded
      val reloaded = Similarity.loadEmbedIndex(s, path, pin = false)
      val pinned = reloaded.truncated()
      reloaded.release()
      IndexFiles.delete(s, path)
      Similarity.embedNoveltyAgainst(e.filter(pmod(col("vec_id"), lit(3)) === 2), pinned)
    }),
    "sim_topk_bruteforce" -> ((s, dir) => Similarity.bruteForceTopK(emb(s, dir))),
    "sim_topk_lsh" -> ((s, dir) => Similarity.lshTopK(emb(s, dir))),
    "sim_topk_ivf" -> ((s, dir) => Similarity.ivfTopK(emb(s, dir))),
    "sim_knn_graph" -> ((s, dir) => Similarity.knnGraph(emb(s, dir))),
    // GRAPH LIFECYCLE: corpus %3==0's graph built from scratch (centroids
    // frozen from that base), %3==1 folded in incrementally — the oracle
    // builds the whole graph over the union under the same frozen
    // centroids, so the hash gate proves folded ≡ from-scratch
    "knn_graph_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val e = emb(s, dir)
      val g0 = Similarity.knnGraphIndex(e.filter(pmod(col("vec_id"), lit(3)) === 0))
      Similarity.refreshKnnGraph(g0, e.filter(pmod(col("vec_id"), lit(3)) === 1))
        .edges.orderBy("query_id", "rnk")
    }),
    // the graph-side delta persistence round trip (dedup/embed/pq _delta's
    // sibling, via TOMBSTONE deltas since a fold supersedes whole
    // query_ids): base graph saved on %3==0, %3==1 folded through the
    // holder with an O(batch) delta write, reloaded (tombstone replay at
    // load) — shares knn_graph_refresh's oracle, so the hash gate proves
    // the persisted replay ≡ from-scratch under the frozen base centroids
    "knn_graph_delta" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val e = emb(s, dir)
      val path = java.nio.file.Files.createTempDirectory("graft-kgidx").toString
      Similarity.saveKnnGraph(
        Similarity.knnGraphIndex(e.filter(pmod(col("vec_id"), lit(3)) === 0)), path)
      val holder = new graft.operators.RefreshableKnnGraph(
        Similarity.loadKnnGraph(s, path))
      holder.fold(e.filter(pmod(col("vec_id"), lit(3)) === 1), deltaPath = Some(path))
      // pin = false: reloaded is immediately checkpointed and discarded
      val reloaded = Similarity.loadKnnGraph(s, path, pin = false)
      val pinned = reloaded.truncated()
      reloaded.release()
      IndexFiles.delete(s, path)
      pinned.edges.orderBy("query_id", "rnk")
    }),
    "graph_quality_prop" -> ((s, dir) => Similarity.qualityPropagation(docs(s, dir), emb(s, dir))),
    "graph_pagerank" -> ((s, dir) => Similarity.pageRank(emb(s, dir))),
    "sim_topk_sq8" -> ((s, dir) => Similarity.sq8TopK(emb(s, dir))),
    "sim_topk_pq" -> ((s, dir) => Similarity.pqTopK(emb(s, dir))),
    "sim_topk_pq_learned" -> ((s, dir) => Similarity.pqTopKLearned(emb(s, dir))),
    // the drift MONITOR hash-pinned: recall@5 of the learned-PQ index's
    // ADC chain vs the exact top-5 — the number retrain policies trigger on
    "sim_pq_recall" -> ((s, dir) =>
      Similarity.pqRecall(Similarity.pqIndexBuild(emb(s, dir)))),
    // the graph-side drift monitor hash-pinned: edge recall@3 of the kNN
    // graph vs the exact top-3 on the deterministic %7 query sample — the
    // number graph rebuild-and-swap policies trigger on
    "sim_graph_recall" -> ((s, dir) =>
      Similarity.knnGraphRecall(Similarity.knnGraphIndex(emb(s, dir)))),
    // the embed-GATE recall monitor hash-pinned (pqRecall's sibling for
    // the novelty gate's LSH candidate generation): among sampled probes
    // whose exact best corpus cosine clears the threshold, the fraction
    // the gate also reports non-novel — the number the embed-gate
    // maintenance cadence observes
    "embed_gate_recall" -> ((s, dir) => Similarity.embedGateRecall(emb(s, dir))),
    // PQ delta persistence round trip (embed_index_delta's PQ sibling):
    // base codebook trained+saved on %3==0, frozen-codebook append of
    // %3==1 persisted as a pure-append delta, reload, answer queries —
    // the oracle encodes the union from scratch under the same codebook
    "sim_pq_delta" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val e = emb(s, dir)
      val path = java.nio.file.Files.createTempDirectory("graft-pqidx").toString
      Similarity.savePqIndex(
        Similarity.pqIndexBuild(e.filter(pmod(col("vec_id"), lit(3)) === 0)), path)
      val loaded = Similarity.loadPqIndex(s, path)
      val (_, delta, dropFoldCaches) = Similarity.appendEncodePqTracked(
        loaded, e.filter(pmod(col("vec_id"), lit(3)) === 1))
      Similarity.savePqIndexDelta(delta, path)
      dropFoldCaches()
      loaded.release()
      // pin = false: reloaded is immediately checkpointed and discarded
      val reloaded = Similarity.loadPqIndex(s, path, pin = false)
      val pinned = reloaded.truncated()
      reloaded.release()
      IndexFiles.delete(s, path)
      Similarity.pqTopKOver(pinned)
    }),
    "sim_topk_ivfpq" -> ((s, dir) => Similarity.ivfpqTopK(emb(s, dir))),
    "sim_topk_ivfpq_learned" -> ((s, dir) => Similarity.ivfpqTopKLearned(emb(s, dir))),
    "embed_kmeans" -> ((s, dir) => Similarity.kmeans(emb(s, dir))),
    "embed_cluster_sample" -> ((s, dir) => Similarity.clusterBalancedSample(emb(s, dir))),
    "text_token_stats" -> ((s, dir) => TextAnalysis.tokenStats(docs(s, dir))),
    "text_subword_tokens" -> ((s, dir) => TextAnalysis.subwordTokens(docs(s, dir))),
    "text_bpe_merges" -> ((s, dir) => TextAnalysis.bpeMerges(docs(s, dir))),
    "text_bpe_tokens" -> ((s, dir) => TextAnalysis.bpeTokens(docs(s, dir))),
    "text_quality" -> ((s, dir) => TextAnalysis.qualityScore(docs(s, dir))),
    "text_quality_classifier" -> ((s, dir) => TextAnalysis.qualityClassifier(docs(s, dir))),
    "text_langid" -> ((s, dir) => TextAnalysis.langId(docs(s, dir))),
    "text_langid_trigram" -> ((s, dir) => TextAnalysis.langIdTrigram(docs(s, dir))),
    "text_fingerprints" -> ((s, dir) => TextAnalysis.fingerprints(docs(s, dir))),
    "text_winnowing_pairs" -> ((s, dir) => TextAnalysis.winnowingPairs(docs(s, dir))),
    "text_top_bigrams" -> ((s, dir) => TextAnalysis.topBigrams(docs(s, dir))),
    "text_contamination" -> ((s, dir) => TextAnalysis.contamination(docs(s, dir))),
    "text_repetition" -> ((s, dir) => TextAnalysis.repetition(docs(s, dir))),
    "text_surprisal" -> ((s, dir) => TextAnalysis.surprisal(docs(s, dir))),
    // the corpus-side PII scrub (log_pii_scrub's documents twin): per-doc
    // detector counts on the original text + the sequentially redacted text
    "text_pii_scrub" -> ((s, dir) => Pii.documentsScrub(docs(s, dir))),
    "text_tfidf_topk" -> ((s, dir) => TextAnalysis.tfidfTopK(docs(s, dir))),
    "text_bm25_topk" -> ((s, dir) => TextAnalysis.bm25TopK(docs(s, dir))),
    // TEXT-STATS PERSISTENCE round trip: BM25 stats base over %3==0, one
    // persisted O(batch) delta folding %3==1, reload (commutative BIGINT
    // re-aggregate), then score the FULL corpus against the replayed
    // stats — the oracle recomputes the same stats population inline, so
    // the hash gate proves base+delta replay ≡ from-scratch stats
    "text_bm25_delta" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val d = docs(s, dir)
      val path = java.nio.file.Files.createTempDirectory("graft-bm25").toString
      TextAnalysis.saveBm25Stats(
        TextAnalysis.bm25Stats(d.filter(pmod(col("doc_id"), lit(3)) === 0)), path)
      TextAnalysis.saveBm25StatsDelta(
        TextAnalysis.bm25Stats(d.filter(pmod(col("doc_id"), lit(3)) === 1)), path)
      val stats = TextAnalysis.loadBm25Stats(s, path).localCheckpoint(true)
      IndexFiles.delete(s, path)
      TextAnalysis.bm25TopKWith(d, stats)
    }),
    "retrieval_hybrid_rrf" -> ((s, dir) =>
      CurationPipeline.hybridRetrievalRrf(docs(s, dir), emb(s, dir))),
    "retrieval_mmr" -> ((s, dir) => Similarity.mmrTopK(emb(s, dir))),
    // hard-negative mining: per query, the top-k nearest DIFFERENT-label
    // vectors — the contrastive-training negatives a retrieval trainer
    // consumes (near-misses, not random easy negatives)
    "retrieval_hard_negatives" -> ((s, dir) => Similarity.hardNegatives(emb(s, dir))),
    // the IVF scale path for full-corpus mining (probed cells, label
    // inequality before the exact-rank tail; the exact row above is its
    // recall reference)
    "retrieval_hard_negatives_ivf" -> ((s, dir) => Similarity.hardNegativesIvf(emb(s, dir))),
    // the mining-quality monitor itself, hash-pinned (pqRecall's sibling)
    "retrieval_hard_neg_recall" -> ((s, dir) => Similarity.hardNegativesRecall(emb(s, dir))),
    "source_report" -> ((s, dir) => TextAnalysis.sourceReport(docs(s, dir))),
    "sample_shuffle" -> ((s, dir) => Sampling.shuffleShards(docs(s, dir))),
    "sample_temperature" -> ((s, dir) => Sampling.temperatureMix(docs(s, dir))),
    "sample_mix" -> ((s, dir) =>
      Sampling.hashSampleStats(docs(s, dir), Sampling.DefaultRates, Sampling.DefaultRate)),
    "sample_kept" -> ((s, dir) =>
      Sampling.hashSampleKept(docs(s, dir), Sampling.DefaultRates, Sampling.DefaultRate)),
    "sample_uniform_k" -> ((s, dir) => Sampling.uniformSample(docs(s, dir))),
    "sample_split" -> ((s, dir) => Sampling.trainValTestSplit(docs(s, dir))),
    "sample_split_neardup" -> ((s, dir) => Sampling.trainValTestSplitNearDup(docs(s, dir))),
    "pack_chunks" -> ((s, dir) => Sampling.packChunks(docs(s, dir))),
    "sample_curriculum" -> ((s, dir) => Sampling.curriculumTiers(docs(s, dir))),
    "pipeline_e2e" -> ((s, dir) => CurationPipeline.e2e(docs(s, dir))),
    "pipeline_e2e_near" -> ((s, dir) => CurationPipeline.e2eNear(docs(s, dir))),
    "pipeline_e2e_semantic" -> ((s, dir) =>
      CurationPipeline.e2eSemantic(docs(s, dir), emb(s, dir))),
    "pipeline_exemplars_semantic" -> ((s, dir) =>
      CurationPipeline.semanticExemplars(docs(s, dir), emb(s, dir))),
    "pipeline_exemplars" -> ((s, dir) => CurationPipeline.qualityExemplars(docs(s, dir))),
    "mm_metadata" -> ((s, dir) => Multimodal.metadata(docs(s, dir))),
    // real ISO-BMFF (MP4) container round trip: per-doc synthetic MP4 bytes
    // parsed back through the pure-JDK moov/mvhd/tkhd box parser; the
    // oracle replays the generation rule
    "mm_video_metadata" -> ((s, dir) => Multimodal.videoMetadata(docs(s, dir))),
    // keyframe tier: sync samples + decode times parsed out of real
    // stts/stss sample tables
    "mm_video_keyframes" -> ((s, dir) => Multimodal.videoKeyframes(docs(s, dir))),
    "mm_dup_frames" -> ((s, dir) => Multimodal.dupFrames(docs(s, dir))),
    "mm_features" -> ((s, dir) => Multimodal.features(docs(s, dir))),
    "mm_frame_sample" -> ((s, dir) => Multimodal.frameSample(docs(s, dir))),
    "mm_frame_features" -> ((s, dir) => Multimodal.frameFeatures(docs(s, dir))),
    "mm_resize" -> ((s, dir) => Multimodal.resize(docs(s, dir))),
  )

  val frameSampleSql: String =
    """WITH d AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS sz FROM documents),
      |f AS (SELECT doc_id, unnest(range(0, (sz - 1) // 16 + 1)) AS frame_idx, sz FROM d)
      |SELECT doc_id, frame_idx, least(16, sz - frame_idx * 16) AS frame_bytes
      |FROM f WHERE frame_idx % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> Dedup.exactSql,
    "dedup_canonical" -> Dedup.canonicalSql,
    "corpus_report" -> Dedup.corpusReportSql,
    "source_overlap" -> Dedup.sourceOverlapSql,
    "dedup_jaccard_pairs" -> Dedup.jaccardPairsSql,
    "dedup_prefix_join" -> Dedup.prefixJoinPairsSql,
    "text_bpe_merges" -> TextAnalysis.bpeMergesSql,
    "text_bpe_tokens" -> TextAnalysis.bpeTokensSql,
    "dedup_containment_pairs" -> Dedup.containmentPairsSql,
    "dedup_minhash_pairs" -> Dedup.minhashPairsSql,
    "dedup_clusters" -> Dedup.clustersSql,
    "dedup_spans" -> Dedup.spansSql,
    "dedup_spans_clean" -> Dedup.spansCleanSql,
    "dedup_incremental" -> Dedup.incrementalSql,
    "dedup_novelty_gate" -> Dedup.incrementalSql,
    "dedup_index_refresh" -> Dedup.indexRefreshSql,
    // the delta rows share the refresh oracles: the oracle knows only the
    // union corpus, so the hash gate proves the PERSISTED base+delta replay
    // answers exactly like a from-scratch build
    "dedup_index_delta" -> Dedup.indexRefreshSql,
    "embed_index_delta" -> Similarity.embedIndexRefreshSql,
    "knn_graph_refresh" -> Similarity.knnGraphRefreshSql,
    "knn_graph_delta" -> Similarity.knnGraphRefreshSql,
    "sim_pq_recall" -> Similarity.pqRecallSql,
    "sim_graph_recall" -> Similarity.knnGraphRecallSql,
    "embed_gate_recall" -> Similarity.embedGateRecallSql(),
    "sim_pq_delta" -> Similarity.pqDeltaTopKSql,
    "embed_index_refresh" -> Similarity.embedIndexRefreshSql,
    "dedup_simhash" -> Dedup.simhashSql,
    "dedup_simhash_pairs" -> Dedup.simhashPairsSql,
    "text_winnowing_pairs" -> TextAnalysis.winnowingPairsSql,
    "embed_cosine_pairs" -> Similarity.cosinePairsSql,
    "embed_lsh_pairs" -> Similarity.lshCosinePairsSql,
    "embed_clusters" -> Similarity.embedClustersSql,
    "embed_novelty_gate" -> Similarity.embedNoveltySql,
    "sim_topk_bruteforce" -> Similarity.bruteForceTopKSql,
    "sim_topk_lsh" -> Similarity.lshTopKSql,
    "sim_topk_ivf" -> Similarity.ivfTopKSql,
    "sim_knn_graph" -> Similarity.knnGraphSql,
    "graph_quality_prop" -> Similarity.qualityPropagationSql,
    "graph_pagerank" -> Similarity.pageRankSql,
    "retrieval_mmr" -> Similarity.mmrTopKSql,
    "retrieval_hard_negatives" -> Similarity.hardNegativesSql,
    "retrieval_hard_negatives_ivf" -> Similarity.hardNegativesIvfSql,
    "retrieval_hard_neg_recall" -> Similarity.hardNegativesRecallSql,
    "sim_topk_sq8" -> Similarity.sq8TopKSql,
    "sim_topk_pq" -> Similarity.pqTopKSql,
    "sim_topk_pq_learned" -> Similarity.pqLearnedTopKSql,
    "sim_topk_ivfpq" -> Similarity.ivfpqTopKSql,
    "sim_topk_ivfpq_learned" -> Similarity.ivfpqLearnedTopKSql,
    "embed_kmeans" -> Similarity.kmeansSql,
    "embed_cluster_sample" -> Similarity.clusterBalancedSampleSql,
    "text_token_stats" -> TextAnalysis.tokenStatsSql,
    "text_subword_tokens" -> TextAnalysis.subwordTokensSql,
    "text_quality" -> TextAnalysis.qualityScoreSql,
    "text_quality_classifier" -> TextAnalysis.qualityClassifierSql,
    "text_langid" -> TextAnalysis.langIdSql,
    "text_langid_trigram" -> TextAnalysis.langIdTrigramSql,
    "text_fingerprints" -> TextAnalysis.fingerprintsSql,
    "text_top_bigrams" -> TextAnalysis.topBigramsSql,
    "text_contamination" -> TextAnalysis.contaminationSql,
    "text_repetition" -> TextAnalysis.repetitionSql,
    "text_surprisal" -> TextAnalysis.surprisalSql,
    "text_pii_scrub" -> Pii.documentsScrubSql,
    "text_tfidf_topk" -> TextAnalysis.tfidfTopKSql,
    "text_bm25_topk" -> TextAnalysis.bm25TopKSql,
    "text_bm25_delta" -> TextAnalysis.bm25DeltaTopKSql,
    "retrieval_hybrid_rrf" -> CurationPipeline.hybridRetrievalRrfSql,
    "source_report" -> TextAnalysis.sourceReportSql,
    "sample_shuffle" -> Sampling.shuffleShardsSql,
    "sample_mix" -> Sampling.hashSampleStatsSql,
    "sample_temperature" -> Sampling.temperatureMixSql,
    "sample_kept" -> Sampling.hashSampleKeptSql,
    "sample_uniform_k" -> Sampling.uniformSampleSql,
    "sample_split" -> Sampling.trainValTestSplitSql,
    "sample_split_neardup" -> Sampling.trainValTestSplitNearDupSql,
    "pack_chunks" -> Sampling.packChunksSql,
    "sample_curriculum" -> Sampling.curriculumTiersSql,
    "pipeline_e2e" -> CurationPipeline.e2eSql,
    "pipeline_e2e_near" -> CurationPipeline.e2eNearSql,
    "pipeline_e2e_semantic" -> CurationPipeline.e2eSemanticSql,
    "pipeline_exemplars_semantic" -> CurationPipeline.semanticExemplarsSql,
    "pipeline_exemplars" -> CurationPipeline.qualityExemplarsSql,
    "mm_metadata" -> Multimodal.metadataSql,
    "mm_video_metadata" -> Multimodal.videoMetadataSql,
    "mm_video_keyframes" -> Multimodal.videoKeyframesSql,
    "mm_dup_frames" -> Multimodal.dupFramesSql,
    "mm_features" -> Multimodal.featuresSql,
    "mm_frame_sample" -> frameSampleSql,
    "mm_frame_features" -> Multimodal.frameFeaturesSql,
    "mm_resize" -> Multimodal.resizeSql,
  )
}
