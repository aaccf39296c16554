package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The END-TO-END curation pass — the composed form the individual
  * operators exist for, as ONE declarative plan a user would actually
  * schedule over a corpus:
  *
  *   exact dedup (keep the min id per distinct text)
  *     → repetition filter      ([[TextAnalysis.repetitionKeep]])
  *     → quality classifier     ([[TextAnalysis.qualityClassifierKeep]])
  *     → mixture sampling       ([[Sampling.keepCondition]])
  *     → sequence packing       ([[Sampling.packChunks]])
  *
  * Because every stage is either a map-side predicate or the dedup semi
  * join, Catalyst fuses the three filters into a single scan predicate
  * behind the join — the whole pass costs one fingerprint aggregation, one
  * semi join, and the per-source packing window, no matter how many
  * filters the pipeline grows. That is the point of composing DataFrame
  * transforms rather than materializing each stage: at 100 TB the corpus
  * is read ONCE. The same chain is available typed
  * ([[graft.model.Documents]]); this is the query-surface form, and
  * [[CurationPipeline.e2eSql]] replays all five stages for the oracle.
  */
object CurationPipeline {

  /** The shared downstream: semi-join the keep set, the three fused
    * map-side filters, sequence packing — ONE definition for every
    * pipeline variant (the Scala twin of [[curationTailSql]]); a new
    * stage added here reaches e2e, e2eNear, and e2eSemantic at once. */
  private def curationTail(docs: DataFrame, keep: DataFrame, budget: Long): DataFrame = {
    val kept = Tables.fanOut(docs)
      .join(keep, Seq("doc_id"), "left_semi")
      .filter(TextAnalysis.repetitionKeep())
      .filter(TextAnalysis.qualityClassifierKeep)
      .filter(Sampling.keepCondition(Sampling.DefaultRates, Sampling.DefaultRate))
    Sampling.packChunks(kept, budget)
  }

  /** Packed training chunks over the fully-curated corpus (see object doc).
    * Output schema matches [[Sampling.packChunks]]. */
  def e2e(docs: DataFrame, budget: Long = 512): DataFrame =
    curationTail(docs,
      Dedup.exact(docs).select(col("keep_id").as("doc_id")), budget)

  /** [[e2e]] with the NEAR-dup stage — the full curation pass:
    *
    *   near-dup cluster keep ([[Dedup.clusters]]: exact-dup collapse is
    *   SUBSUMED — exact copies share a component, so keeping each
    *   component's minimum id is exact dedup and minhash-cluster dedup in
    *   one semi join)
    *     → repetition filter → quality classifier → mixture sampling
    *     → sequence packing.
    *
    * Plan shape: the cluster keep-set comes from the pinned dup-group
    * collapse plus the (eager, localCheckpoint-per-round) large-star/small-star CC
    * loop — the one part of the pipeline that is inherently iterative —
    * after which the downstream is the same single declarative plan as
    * [[e2e]]: the three filters still fuse into ONE scan predicate behind
    * the keep-set semi join (plan-asserted in ScaleTechniquesSpec). */
  def e2eNear(docs: DataFrame, budget: Long = 512,
      threshold: Double = 0.8): DataFrame =
    curationTail(docs,
      Dedup.clusters(docs, threshold).filter(col("kept")).select("doc_id"), budget)

  /** The downstream-stage SQL shared by [[e2eSql]] and [[e2eNearSql]]:
    * repetition + classifier + mixture + packing over the docs selected by
    * a preceding `keepids(doc_id)` CTE — each stage's arithmetic identical
    * to its stand-alone oracle. */
  private val curationTailSql: String = {
    val stopList = TextAnalysis.StopWords.map(w => s"'$w'").mkString(", ")
    val (b, w1, w2, w3, w4) = TextAnalysis.ClassifierWeights
    s"""base AS (
       |  SELECT d.doc_id, d.text, d.source, d.n_chars, string_split(d.text, ' ') AS t
       |  FROM documents d JOIN keepids USING (doc_id)),
       |feat AS (
       |  SELECT doc_id, text, source, n_chars,
       |    CAST(len(t) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(t, x -> x IN ($stopList))) AS BIGINT) AS n_stop
       |  FROM base),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))) AS bg
       |  FROM base WHERE len(t) >= 2),
       |cnt AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
       |topbg AS (SELECT doc_id, max(c) AS top_bigram_count FROM cnt GROUP BY 1),
       |kept AS (
       |  SELECT f.source, f.doc_id, f.n_tokens
       |  FROM feat f LEFT JOIN topbg USING (doc_id)
       |  WHERE CAST(coalesce(top_bigram_count, 0) AS DOUBLE) * 2.0 / n_tokens <= 0.18
       |    AND CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens <= 0.5
       |    AND (((($b + $w1 * (CAST(n_stop AS DOUBLE) / n_tokens))
       |          + $w2 * (CAST(n_distinct AS DOUBLE) / n_tokens))
       |          + $w3 * (CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens))
       |          + $w4 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0)) >= 0.0
       |    AND (n_tokens < ${TextAnalysis.StopFloorMinTokens}
       |         OR n_stop * ${TextAnalysis.StopFloorInvRatio} >= n_tokens)
       |    AND CAST(CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) AS DOUBLE) / 65536.0
       |        < ${Sampling.rateCaseSql}),
       |o AS (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS tok_offset
       |  FROM kept)
       |SELECT source, doc_id, n_tokens, tok_offset,
       |  CAST(tok_offset // 512 AS BIGINT) AS chunk_first,
       |  CAST((tok_offset + n_tokens - 1) // 512 AS BIGINT) AS chunk_last
       |FROM o ORDER BY source, doc_id""".stripMargin
  }

  /** DuckDB oracle for [[e2e]] at the defaults: exact-dedup keep ids, then
    * the shared stage tail (dedup_exact / text_repetition /
    * text_quality_classifier / sample_kept / pack_chunks — all proven
    * hash-exact separately; the composition adds no new arithmetic). */
  val e2eSql: String =
    s"""WITH keepids AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |$curationTailSql""".stripMargin

  /** DuckDB oracle for [[e2eNear]] at the defaults: the minhash-pair chain
    * and transitive-reachability components (exactly [[Dedup.clustersSql]]'s
    * construction), keep ids = component minima, then the shared stage
    * tail. */
  val e2eNearSql: String =
    s"""WITH RECURSIVE ${Dedup.minhashPairsCoreSql},
       |pairs AS (
       |  SELECT doc_a, doc_b FROM crossp
       |  UNION ALL SELECT doc_a, doc_b FROM intra),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.b, re.r FROM reach re JOIN edges e ON e.a = re.id),
       |keepids AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING min(r) = id),
       |$curationTailSql""".stripMargin

  /** [[e2eNear]] with SEMANTIC dedup (SemDeDup — Abbas et al. 2023,
    * arXiv:2303.09540): the keep set swaps the minhash TEXT clusters for
    * embedding-similarity components ([[Similarity.embedClusters]] over
    * the corpus's embedding table; `vec_id ≡ doc_id` in the testdata, the
    * usual contract when embeddings are computed per document). This is
    * the tier shingle dedup cannot reach — paraphrases, translations, and
    * template re-renders share no n-grams but collapse to one exemplar
    * per semantic component here. Downstream is the identical single
    * fused-filter scan as [[e2e]]/[[e2eNear]]; the keep side reads the
    * memoized embedding-CC labels, so the corpus text is still read
    * exactly once. */
  def e2eSemantic(docs: DataFrame, emb: DataFrame, budget: Long = 512): DataFrame =
    curationTail(docs,
      Similarity.embedClusters(emb)
        .filter(col("kept")).select(col("vec_id").as("doc_id")), budget)

  /** DuckDB oracle for [[e2eSemantic]] at the defaults: the shared
    * embedding reachability chain ([[Similarity.embedReachCoreSql]]),
    * keep ids = component minima, then the shared stage tail. */
  val e2eSemanticSql: String =
    s"""WITH RECURSIVE ${Similarity.embedReachCoreSql()},
       |keepids AS (SELECT id AS doc_id FROM sreach GROUP BY id HAVING min(r) = id),
       |$curationTailSql""".stripMargin

  /** QUALITY-ranked exemplar selection — the keep decision [[e2eNear]]'s
    * min-id rule upgrades to when quality varies inside a duplicate
    * family: from each near-dup cluster ([[Dedup.clusters]]) keep the
    * member with the HIGHEST [[TextAnalysis.qualityScore]] (ties to the
    * lower doc_id) — `(cluster_id, keep_id, quality_score, n_members)`.
    * This is how a curation pass actually resolves near-dup families: not
    * "first crawled wins" but "best copy wins" (boilerplate-stripped
    * mirrors, paywalled truncations, and OCR re-crawls of the same page
    * differ exactly in quality score).
    *
    * Plan shape: both inputs are the pipeline's existing materializations
    * (memoized cluster labels, map-side quality features); the selection
    * itself is ONE map-side-combinable `max_by` fold keyed by cluster —
    * no window, no text through the shuffle. Score arithmetic is the
    * hash-exact text_quality chain, so [[qualityExemplarsSql]] replays
    * the selection deterministically, ties included. */
  /** HYBRID RETRIEVAL — Reciprocal Rank Fusion of the two ranking
    * modalities the library already retrieves with: the BM25 keyword list
    * ([[TextAnalysis.bm25TopK]], fixed term set) and the embedding cosine
    * list ([[Similarity.bruteForceTopK]], query vector 0; `vec_id ≡
    * doc_id` in the corpus). RRF: `score(d) = Σ_lists 1/(K + rank_d)`
    * with the standard K=60 — rank fusion is robust to the two lists'
    * incomparable score scales, which is why curation/RAG pipelines fuse
    * ranks rather than scores when pulling topic-targeted subsets.
    *
    * Exactness contract (the rational-idf / quantized-cosine idiom): ranks
    * are integers 1..10, so each contribution is `L div (60 + r)` with
    * `L = lcm(61..70) = 142813628717760` — an exact BIGINT both engines
    * compute identically; the fused sum ≤ 2·L/61 ≈ 4.7e12, no overflow.
    *
    * 100 TB shape: the only corpus-proportional work is inside the two
    * top-k producers (one scan + scalar reduce each); everything here runs
    * on two ≤10-row frames. The BM25 rank comes from ONE bounded
    * collect_list → array_sort → posexplode (10 structs in one row), not a
    * partitionless window and not a rank-by-better self-join that would
    * re-run the corpus scan — the registry-wide single-task-sort ban stays
    * meaningful and the corpus is read once per modality. The fusion is a
    * union of the two 10-row lists + one tiny groupBy. */
  def hybridRetrievalRrf(docs: DataFrame, emb: DataFrame): DataFrame = {
    val L = 142813628717760L // lcm(61..70): L div (60+r) exact for r in 1..10
    val bm = TextAnalysis.bm25TopK(docs, k = 10).select(col("doc_id"), col("score"))
    val bmRank = bm
      .agg(collect_list(struct(negate(col("score")).as("ns"), col("doc_id"))).as("l"))
      .select(posexplode(array_sort(col("l")))) // (-score, doc_id) asc = score desc, id asc
      .select(col("col.doc_id").as("doc_id"), (col("pos") + 1L).cast("long").as("r"))
    val vecRank = Similarity.bruteForceTopK(emb, k = 10, nQueries = 1)
      .select(col("neighbor_id").as("doc_id"), col("rnk").as("r"))
    bmRank.select(col("doc_id"), col("r"), lit("bm25").as("side"))
      .unionByName(vecRank.select(col("doc_id"), col("r"), lit("vec").as("side")))
      .groupBy("doc_id")
      .agg(
        sum(expr(s"${L}L div (60L + r)")).as("rrf_scaled"),
        max(when(col("side") === "bm25", col("r")).otherwise(0L)).as("bm25_rank"),
        max(when(col("side") === "vec", col("r")).otherwise(0L)).as("vec_rank"))
      .orderBy(col("rrf_scaled").desc, col("doc_id"))
      .limit(10)
  }

  /** Composed from the SAME oracle CTE chains its two source rankings
    * check against ([[TextAnalysis.bm25ScoreCtesSql]],
    * [[Similarity.bruteForceRankedSql]]) — a constant change there reaches
    * this oracle automatically. Lazy: both referenced vals live in objects
    * this object must not force mid-init. */
  lazy val hybridRetrievalRrfSql: String =
    s"""WITH ${TextAnalysis.bm25ScoreCtesSql},
      |bm AS (
      |  SELECT doc_id, r FROM (
      |    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
      |    FROM bmscore) WHERE r <= 10),
      |${Similarity.bruteForceRankedSql(1)},
      |vec AS (
      |  SELECT neighbor_id AS doc_id, CAST(rnk AS BIGINT) AS r
      |  FROM bfranked WHERE rnk <= 10),
      |contrib AS (
      |  SELECT doc_id, r, 'bm25' AS side FROM bm
      |  UNION ALL SELECT doc_id, r, 'vec' AS side FROM vec)
      |SELECT doc_id,
      |  CAST(sum(142813628717760 // (60 + r)) AS BIGINT) AS rrf_scaled,
      |  CAST(max(CASE WHEN side = 'bm25' THEN r ELSE 0 END) AS BIGINT) AS bm25_rank,
      |  CAST(max(CASE WHEN side = 'vec' THEN r ELSE 0 END) AS BIGINT) AS vec_rank
      |FROM contrib GROUP BY doc_id
      |ORDER BY rrf_scaled DESC, doc_id LIMIT 10""".stripMargin

  def qualityExemplars(docs: DataFrame): DataFrame =
    exemplarsOf(Dedup.clusters(docs).select("doc_id", "cluster_id"), docs)

  /** [[qualityExemplars]]' "best copy wins" rule at the SEMANTIC tier:
    * from each embedding-similarity component ([[Similarity.embedClusters]],
    * `vec_id ≡ doc_id`) keep the member with the highest
    * [[TextAnalysis.qualityScore]], ties to the lower id — how a SemDeDup
    * pass picks which paraphrase/translation/re-render survives, rather
    * than "lowest id wins". Same one-fold `max_by` shape over the memoized
    * component labels; no window, no text through the shuffle. */
  def semanticExemplars(docs: DataFrame, emb: DataFrame): DataFrame =
    exemplarsOf(
      Similarity.embedClusters(emb)
        .select(col("vec_id").as("doc_id"), col("cluster_id")),
      docs)

  /** DuckDB oracle for [[semanticExemplars]]: the shared embedding
    * reachability chain ([[Similarity.embedReachCoreSql]]), then the
    * shared exemplar tail. */
  val semanticExemplarsSql: String =
    s"""WITH RECURSIVE ${Similarity.embedReachCoreSql()},
       |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM sreach GROUP BY id),
       |$exemplarTailSql""".stripMargin

  /** The shared exemplar selection — best-quality member per cluster
    * (ties to the lower doc_id) over a `(doc_id, cluster_id)` frame: ONE
    * `max_by` fold, no window, no text through the shuffle. One
    * definition for the text tier ([[qualityExemplars]]) and the semantic
    * tier ([[semanticExemplars]]); [[exemplarTailSql]] is its SQL twin. */
  private def exemplarsOf(clusters: DataFrame, docs: DataFrame): DataFrame =
    clusters
      .join(TextAnalysis.qualityScore(docs).select("doc_id", "quality_score"), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(
        max_by(struct(col("doc_id"), col("quality_score")),
          struct(col("quality_score"), (-col("doc_id")).as("nd"))).as("b"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("b.doc_id").as("keep_id"),
        col("b.quality_score").as("quality_score"), col("n_members"))
      .orderBy("cluster_id")

  /** The exemplar-selection SQL tail over a preceding `cl(doc_id,
    * cluster_id)` CTE: unchanged quality-score chain, best member by
    * (score DESC, doc_id), member counts. LAZY: referenced by oracle vals
    * declared ABOVE it — a strict val would interpolate null there
    * (object-init order), which is exactly how the r6 review-refactor
    * briefly broke this oracle. */
  private lazy val exemplarTailSql: String =
    s"""qx AS (${TextAnalysis.qualityScoreSql}),
       |j AS (
       |  SELECT cl.cluster_id, cl.doc_id, qx.quality_score
       |  FROM cl JOIN qx USING (doc_id)),
       |best AS (
       |  SELECT cluster_id, doc_id AS keep_id, quality_score,
       |    ROW_NUMBER() OVER (PARTITION BY cluster_id
       |      ORDER BY quality_score DESC, doc_id) AS rn
       |  FROM j),
       |nm AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members FROM j GROUP BY 1)
       |SELECT b.cluster_id, keep_id, quality_score, n_members
       |FROM best b JOIN nm USING (cluster_id) WHERE rn = 1
       |ORDER BY b.cluster_id""".stripMargin

  /** DuckDB oracle for [[qualityExemplars]]: the cluster reachability CTE
    * (exactly [[Dedup.clustersSql]]'s construction), then the shared
    * exemplar tail. */
  val qualityExemplarsSql: String =
    s"""WITH RECURSIVE ${Dedup.minhashPairsCoreSql},
       |pairs AS (
       |  SELECT doc_a, doc_b FROM crossp
       |  UNION ALL SELECT doc_a, doc_b FROM intra),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.b, re.r FROM reach re JOIN edges e ON e.a = re.id),
       |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
       |$exemplarTailSql""".stripMargin
}
