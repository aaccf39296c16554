package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{RefreshablePqIndex, Similarity}

/** CODEBOOK DRIFT, measured and recovered: append-encoding a
  * distribution-shifted batch under a FROZEN learned-PQ codebook degrades
  * recall@k (the codebook has no code words for the new region, so ADC
  * collapses its candidates), [[Similarity.pqRecall]] OBSERVES the drop,
  * and [[graft.operators.RefreshablePqIndex.retrain]] (new Lloyd codebook
  * over the refreshed corpus + full re-encode + version bump) recovers it.
  *
  * Fixture: 64-dim vectors in "families" (a shared block pattern + a tiny
  * per-member perturbation, so a member's true top-k is its co-members).
  * The ORIGINAL corpus lives entirely in subspaces 0–3 (dims 0–31); the
  * SHIFTED batch lives in subspaces 4–7 (dims 32–63) — a region the
  * version-1 codebook trained on near-constant slices, so its code words
  * there are degenerate. Shifted ids are the query set (vec_id < 10). */
class PqDriftSpec extends SparkSpec {

  // deterministic synthetic vector: family pattern on an 8-dim active
  // block, small member perturbation, tiny structured noise elsewhere
  private def vec(blockStart: Int, f: Int, m: Int, id: Long): (Long, Seq[Float], Int) = {
    val a = Array.fill(64)(0.0f)
    (0 until 64).foreach(d => a(d) = 0.001f * ((id * 13 + d) % 3))
    (0 until 8).foreach { j =>
      a(blockStart + j) = 0.5f + 0.1f * ((f * 7 + j * 3) % 5)
    }
    a((blockStart + (m % 8)).toInt) += 0.01f * (m + 1)
    (id, a.toSeq, f)
  }

  private def frame(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  // original: 10 families × 10 members in subspaces 0–3, ids 1000+
  private lazy val original = frame(for {
    f <- 0 until 10; m <- 0 until 10
  } yield vec(8 * (f % 4), f, m, 1000L + f * 10 + m))

  // shifted: 5 families × 10 members in subspaces 4–7, ids 0–49 (so the
  // default query set vec_id < 10 is one full shifted family)
  private lazy val shifted = frame(for {
    f <- 0 until 5; m <- 0 until 10
  } yield vec(32 + 8 * (f % 4), f, m, f * 10L + m))

  test("drift is measured: frozen-codebook recall drops on a shifted batch, retrain-and-swap recovers it") {
    val holder = new RefreshablePqIndex(Similarity.pqIndexBuild(original))
    assert(holder.current.version == 1)

    // routine ingest: frozen-codebook append (version unchanged, O(batch))
    holder.append(shifted)
    assert(holder.current.version == 1)
    assert(holder.current.codes.select("vec_id").distinct().count() == 150)

    val frozen = Similarity.pqRecall(holder.current, k = 5, nQueries = 10, rerank = 8)
      .head()
    val frozenRecall = frozen.getAs[Double]("recall")
    assert(frozen.getAs[Int]("version") == 1)

    // the monitoring signal fires → retrain over the full refreshed corpus
    holder.retrain(original.unionAll(shifted))
    assert(holder.current.version == 2, "retrain must bump the codebook version")
    val retrained = Similarity.pqRecall(holder.current, k = 5, nQueries = 10, rerank = 8)
      .head()
    val retrainedRecall = retrained.getAs[Double]("recall")

    assert(frozenRecall + 0.2 <= retrainedRecall,
      s"retraining must recover shifted-region recall: frozen $frozenRecall vs retrained $retrainedRecall")
    assert(retrainedRecall >= 0.7,
      s"the retrained codebook must actually index the shifted region: $retrainedRecall")
    assert(frozenRecall < 0.7,
      s"the fixture must genuinely drift (frozen recall should be poor): $frozenRecall")
  }

  test("append-encode is exact encoding under the frozen codebook (the holder adds no drift of its own)") {
    val idx = Similarity.pqIndexBuild(original)
    val appended = Similarity.appendEncodePq(idx, shifted)
    val holder = new RefreshablePqIndex(Similarity.pqIndexBuild(original))
    holder.append(shifted)
    def codeSet(i: Similarity.PqIndex): Set[(Long, Long, Long)] =
      i.codes.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("m"),
        r.getAs[Long]("code"))).toSet
    assert(codeSet(holder.current) == codeSet(appended))
    // old codes pass through verbatim; new ids encode against v1's codebook
    assert(codeSet(appended).filter(_._1 >= 1000L) == codeSet(idx))
  }
}
