package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexFiles, PinnedCaches, RefreshableCorpusIndex, RefreshableEmbedIndex, Similarity}
import graft.streaming.StreamingDedup

/** DELTA-STRUCTURED INDEX PERSISTENCE: a fold loop must write O(batch)
  * bytes per fold (never O(index)), the base+delta replay must load
  * contents-identical to the in-memory folded index, compaction must be a
  * pure representation change, the durable closed loop must survive a
  * crash BETWEEN batches without losing a fold (the window the old
  * driver-memory staging left open), and the fold loop must not leak
  * executor storage (the pin-per-fold regression). The `dedup_index_delta`
  * / `embed_index_delta` registry rows additionally pin the round trip
  * against the DuckDB oracle on the real corpus. */
class IndexDeltaSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def variant(tag: String): String =
    s"the quick brown fox jumps over the lazy dog while seventeen green " +
      s"turtles carry heavy stones across the wide river valley under a " +
      s"pale winter sky token $tag ends the story here"

  private def fpsSet(idx: Dedup.CorpusIndex): Set[(String, Long)] =
    idx.fps.collect().map(r => (r.getAs[String]("fp"), r.getAs[Long]("match_id"))).toSet
  private def setsSet(idx: Dedup.CorpusIndex): Set[(Long, Seq[Long])] =
    idx.sets.collect().map(r => (r.getAs[Long]("doc_id"), r.getSeq[Long](1))).toSet
  private def bucketsSet(idx: Dedup.CorpusIndex): Set[(Long, Int, String)] =
    idx.buckets.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("band"), r.getAs[String]("sig"))).toSet
  private def ovSet(idx: Dedup.CorpusIndex): Set[(Int, String, Long)] =
    idx.oversized.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
  private def sameContents(a: Dedup.CorpusIndex, b: Dedup.CorpusIndex): Unit = {
    assert(fpsSet(a) == fpsSet(b))
    assert(setsSet(a) == setsSet(b))
    assert(bucketsSet(a) == bucketsSet(b))
    assert(ovSet(a) == ovSet(b))
    assert(a.bucketCap == b.bucketCap && a.logBloomBits == b.logBloomBits)
  }

  private def gateRows(out: DataFrame): Seq[(Long, Option[Long], Option[Double], Boolean)] =
    out.collect().map(r => (r.getAs[Long]("doc_id"),
      Option(r.get(r.fieldIndex("best_match"))).map(_.asInstanceOf[Long]),
      Option(r.get(r.fieldIndex("best_jaccard"))).map(_.asInstanceOf[Double]),
      r.getAs[Boolean]("novel"))).toSeq.sortBy(_._1)

  private def dirBytes(path: String): Long = {
    val f = IndexFiles.fs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (f.exists(p)) f.getContentSummary(p).getLength else 0L
  }

  test("base + delta replay loads contents-identical; compaction is a pure representation change") {
    val cap = 2
    // corpus with a cap-straddling family so buckets/oversized are exercised
    val corpus0 = docsDf(
      10L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      11L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      12L -> variant("u"), 13L -> variant("v"),
      15L -> "completely different content about winter mountain hiking gear and maps")
    // fold 1: re-key (5 < 10), a family member pushing buckets over the cap
    val b1 = docsDf(
      5L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      20L -> variant("w"),
      21L -> "fresh unique sentence with enough words to shingle comfortably today")
    // fold 2: stays-dropped family member + a brand-new text
    val b2 = docsDf(30L -> variant("z"),
      31L -> "entirely new second fold text with plenty of distinct words inside")

    val path = tmpDir("delta-rt")
    Dedup.saveIndex(Dedup.corpusIndex(corpus0, bucketCap = cap), path)
    val ref = new RefreshableCorpusIndex(Dedup.loadIndex(spark, path))
    ref.fold(b1, deltaPath = Some(path))
    ref.fold(b2, deltaPath = Some(path))
    assert(IndexFiles.numbered(spark, path, "delta_").map(_._1) == Seq(1L, 2L),
      "each fold must land exactly one numbered delta")

    // load over base + 2 deltas ≡ the in-memory folded index
    val loaded = Dedup.loadIndex(spark, path)
    sameContents(loaded, ref.current)
    // ≡ from-scratch over the union (transitively, but assert directly too)
    val scratch = Dedup.corpusIndex(corpus0.unionAll(b1).unionAll(b2), bucketCap = cap)
    sameContents(loaded, scratch)
    // gate decisions agree, including through the Bloom prefilters
    val gate = docsDf(
      40L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      41L -> variant("q"),
      42L -> "wholly novel gate document text that matches nothing in any corpus batch")
    assert(gateRows(Dedup.bestMatchAgainst(gate, loaded)) ==
      gateRows(Dedup.bestMatchAgainst(gate, scratch)))
    loaded.release()

    // compaction: contents identical, deltas swept, ONE base version left
    Dedup.compactIndex(spark, path)
    assert(IndexFiles.numbered(spark, path, "delta_").isEmpty, "compaction sweeps folded deltas")
    assert(IndexFiles.numbered(spark, path, "base_v").size == 1, "superseded bases pruned")
    val compacted = Dedup.loadIndex(spark, path)
    sameContents(compacted, scratch)
    assert(gateRows(Dedup.bestMatchAgainst(gate, compacted)) ==
      gateRows(Dedup.bestMatchAgainst(gate, scratch)))

    // and the lifecycle continues on the compacted artifact: a further fold
    // lands delta ids ABOVE the compacted base's last_delta stamp
    val ref2 = new RefreshableCorpusIndex(compacted)
    val b3 = docsDf(50L -> "third fold after compaction carries yet more unseen words still")
    ref2.fold(b3, deltaPath = Some(path))
    val after = Dedup.loadIndex(spark, path)
    sameContents(after,
      Dedup.corpusIndex(corpus0.unionAll(b1).unionAll(b2).unionAll(b3), bucketCap = cap))
    after.release()
    IndexFiles.delete(spark, path)
  }

  test("per-fold writes are O(batch), not O(index): delta bytes stay flat as the index grows") {
    // base = 240 docs; folds = 3 equal 12-doc batches. If a fold rewrote
    // the index, fold K's bytes would track the INDEX size (growing, and
    // ~base-sized); O(batch) deltas stay flat and far below the base.
    def doc(i: Long) = i -> (s"document number $i carries its own distinct tail " +
      s"word${i}a word${i}b word${i}c word${i}d word${i}e word${i}f word${i}g")
    val base = docsDf((0L until 240L).map(doc): _*)
    val folds = (0 until 3).map(k =>
      docsDf((1000L + 12 * k until 1000L + 12 * (k + 1)).map(doc): _*))

    val path = tmpDir("delta-size")
    Dedup.saveIndex(Dedup.corpusIndex(base), path)
    val baseBytes = dirBytes(s"$path/base_v1")
    val ref = new RefreshableCorpusIndex(Dedup.loadIndex(spark, path))
    val deltaBytes = folds.zipWithIndex.map { case (b, k) =>
      ref.fold(b, deltaPath = Some(path))
      dirBytes(s"$path/delta_${k + 1}")
    }
    // each delta is a small fraction of the base (12 docs vs 240 + parquet
    // footer floor), and deltas do NOT grow as the index grows
    deltaBytes.foreach { d =>
      assert(d > 0 && d < baseBytes / 2,
        s"delta must be batch-sized, got $d vs base $baseBytes")
    }
    assert(deltaBytes.max.toDouble / deltaBytes.min < 2.0,
      s"equal batches must write equal-ish deltas (flat in index size): $deltaBytes")
    // the loaded result is still exactly the union index
    val loaded = Dedup.loadIndex(spark, path)
    val scratch = Dedup.corpusIndex(folds.foldLeft(base)(_ unionAll _))
    assert(fpsSet(loaded) == fpsSet(scratch) && bucketsSet(loaded) == bucketsSet(scratch))
    loaded.release()
    IndexFiles.delete(spark, path)
  }

  test("durable closed loop: a crash BETWEEN batches no longer loses the staged fold") {
    val corpus0 = docsDf(100L -> variant("u"))
    val b1 = docsDf(201L -> "crash test wave one text with plenty of distinct words inside")
    val b2 = docsDf(301L -> "crash test wave two text sharing nothing with wave one either")
    val b3 = docsDf(
      401L -> "crash test wave one text with plenty of distinct words inside", // copy of 201
      402L -> "crash test wave two text sharing nothing with wave one either", // copy of 301
      403L -> "wave three novel text arriving after the unplanned crash")

    def freshGate(path: String): StreamingDedup.IngestGate = {
      val idx0 =
        if (Dedup.indexExists(spark, path)) Dedup.loadIndex(spark, path)
        else { val i = Dedup.corpusIndex(corpus0); Dedup.saveIndex(i, path); i }
      StreamingDedup.novelNearCorpusIngest(new RefreshableCorpusIndex(idx0),
        indexPath = Some(path))
    }

    // control: one gate, uninterrupted
    val pc = tmpDir("loop-control")
    val gc = freshGate(pc)
    gc(b1, 0L); gc(b2, 1L)
    val controlB3 = gateRows(gc(b3, 2L))
    gc.flush()
    val controlLoaded = Dedup.loadIndex(spark, pc)
    val controlFps = fpsSet(controlLoaded)
    controlLoaded.release()

    // crashed run: batches 0 and 1, then the process dies — NO flush, no
    // explicit save; the staged dir and deltas are all that survive
    val p = tmpDir("loop-crash")
    val g1 = freshGate(p)
    g1(b1, 0L); g1(b2, 1L)
    // "restart": a brand-new holder + gate rebuilt purely from disk
    val g2 = freshGate(p)
    val gotB3 = gateRows(g2(b3, 2L))
    assert(gotB3 == controlB3,
      s"post-crash decisions must equal the uninterrupted loop:\n got $gotB3\n want $controlB3")
    // the fold really happened: copies of BOTH pre-crash admissions reject
    val byId = gotB3.map(r => r._1 -> r).toMap
    assert(!byId(401L)._4 && byId(401L)._2 == Some(201L))
    assert(!byId(402L)._4 && byId(402L)._2 == Some(301L))
    assert(byId(403L)._4)
    g2.flush()
    val crashedLoaded = Dedup.loadIndex(spark, p)
    assert(fpsSet(crashedLoaded) == controlFps, "final persisted indexes must agree")
    crashedLoaded.release()
    IndexFiles.delete(spark, p); IndexFiles.delete(spark, pc)
  }

  test("durable closed loop: --near-compact-every bounds the delta chain, decisions unchanged") {
    // without periodic compaction the loop appends delta_N forever and a
    // restart replays an unbounded chain; with compactEvery = 2 the chain
    // stays ≤ 2 and bases advance, while every decision (and the final
    // persisted index) equals the never-compacting control's
    val corpus0 = docsDf(100L -> variant("u"))
    val batches = (0 until 5).map(k => docsDf(
      (200L + 10 * k) -> s"compaction wave $k doc one with its own words w${k}a w${k}b",
      (201L + 10 * k) -> variant("u"), // rejected near-dup each wave
      (202L + 10 * k) -> s"compaction wave $k doc two carrying tokens t${k}x t${k}y"))

    def run(path: String, every: Int): Seq[Seq[(Long, Option[Long], Option[Double], Boolean)]] = {
      val idx0 = Dedup.corpusIndex(corpus0); Dedup.saveIndex(idx0, path)
      val g = StreamingDedup.novelNearCorpusIngest(
        new RefreshableCorpusIndex(Dedup.loadIndex(spark, path)),
        indexPath = Some(path), compactEvery = every)
      val out = batches.zipWithIndex.map { case (b, i) => gateRows(g(b, i.toLong)) }
      g.flush()
      out
    }
    val pc = tmpDir("compact-ctl"); val pm = tmpDir("compact-on")
    val control = run(pc, 0)
    val maintained = run(pm, 2)
    assert(maintained == control, "compaction must never change a decision")
    // the chain is bounded and the base advanced past v1
    assert(IndexFiles.numbered(spark, pm, "delta_").size <= 2,
      s"delta chain must stay bounded: ${IndexFiles.numbered(spark, pm, "delta_")}")
    assert(IndexFiles.numbered(spark, pm, "base_v").head._1 > 1L,
      "compaction must have published a new base")
    assert(IndexFiles.numbered(spark, pc, "delta_").size == 5,
      "control: one delta per non-empty fold, never compacted")
    // the persisted artifacts agree
    val a = Dedup.loadIndex(spark, pm); val b = Dedup.loadIndex(spark, pc)
    assert(fpsSet(a) == fpsSet(b) && bucketsSet(a) == bucketsSet(b))
    a.release(); b.release()
    IndexFiles.delete(spark, pm); IndexFiles.delete(spark, pc)
  }

  test("durable closed loop: a re-delivered batch re-gates identically (replay determinism)") {
    val corpus0 = docsDf(100L -> variant("u"))
    val b1 = docsDf(201L -> "replay wave one text with plenty of distinct words inside")
    val b2 = docsDf(
      301L -> "replay wave one text with plenty of distinct words inside", // copy of 201
      302L -> "replay wave two brand new text that shares no words with anything")

    val p = tmpDir("loop-replay")
    val idx0 = Dedup.corpusIndex(corpus0); Dedup.saveIndex(idx0, p)
    val g = StreamingDedup.novelNearCorpusIngest(
      new RefreshableCorpusIndex(Dedup.loadIndex(spark, p)), indexPath = Some(p))
    g(b1, 0L)
    val first = gateRows(g(b2, 1L))
    // foreachBatch re-delivery: same batch, same id — the `before` guard
    // must keep batch 1's own staged admissions out of its replay's index
    val replay = gateRows(g(b2, 1L))
    assert(replay == first, s"replay must be deterministic:\n $first\n $replay")
    assert(!first.find(_._1 == 301L).get._4, "copy of the folded admission rejects")
    assert(first.find(_._1 == 302L).get._4)
    g.flush()
    // exactly one fold of batch 1's admissions despite the double staging
    val loaded = Dedup.loadIndex(spark, p)
    val scratch = Dedup.corpusIndex(corpus0.unionAll(b1).unionAll(docsDf(
      302L -> "replay wave two brand new text that shares no words with anything")))
    assert(fpsSet(loaded) == fpsSet(scratch))
    loaded.release()
    IndexFiles.delete(spark, p)
  }

  test("fold loop storage stays bounded: no pins accumulate, intermediates drop each fold") {
    val corpus0 = docsDf((0L until 40L).map(i =>
      i -> s"bounded storage corpus doc $i tail word${i}x word${i}y word${i}z"): _*)
    val ref = new RefreshableCorpusIndex(Dedup.corpusIndex(corpus0))
    val pins0 = PinnedCaches.size(spark)
    val rdds0 = spark.sparkContext.getPersistentRDDs.size
    (0 until 3).foreach { k =>
      ref.fold(docsDf((100L + 10 * k until 100L + 10 * (k + 1)).map(i =>
        i -> s"fold $k doc $i with its own distinct words word${i}p word${i}q"): _*))
    }
    // the fold path pins NOTHING (pinning intermediates rooted them in the
    // TrieMap forever — one leaked index per fold, the r10 advice defect);
    // it only RELEASES (the superseded initial index's pins drop after the
    // first swap), so the registry can shrink but never grow
    assert(PinnedCaches.size(spark) <= pins0,
      s"folds must not grow the pin registry: $pins0 -> ${PinnedCaches.size(spark)}")
    // tracked intermediates are dropped eagerly; what can remain persisted
    // is the published checkpointed index (6 frames) plus superseded
    // checkpoints awaiting the ContextCleaner — far below the ~20 frames a
    // leaking fold would pin PER FOLD
    val growth = spark.sparkContext.getPersistentRDDs.size - rdds0
    assert(growth <= 3 * 8,
      s"persistent-RDD growth after 3 folds must stay bounded, got $growth")
  }

  test("segmented folds checkpoint O(batch), not O(index): new storage stays flat at 10x the index") {
    // the in-memory twin of the delta-bytes test: a fold must CHECKPOINT
    // only its fresh segment + tiny tables. Fold the SAME batch into a 1x
    // and a 10x index and compare the newly-persisted storage — the old
    // monolithic truncated()-per-fold re-materialized every component, so
    // its delta tracked the INDEX size.
    // logBloomBits = 12: the folded Bloom word tables are CAPACITY-bounded
    // (≤ 2^logBits/64 rows — a build-time knob, constant w.r.t. corpus
    // growth), and at the default 2^20 they would not yet have saturated
    // at this test's scale, masking the batch-proportional term this test
    // pins. Saturate them so the per-fold delta isolates the segment.
    def doc(i: Long) = i -> (s"segmented storage doc $i with its own tail " +
      s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e")
    val batch = docsDf((9000L until 9012L).map(doc): _*)
    def foldStorageDelta(corpusSize: Long): Long = {
      val ref = new RefreshableCorpusIndex(
        Dedup.corpusIndex(docsDf((0L until corpusSize).map(doc): _*), logBloomBits = 12))
      ref.current.materialize() // settle the view inputs
      val before = spark.sparkContext.getRDDStorageInfo
        .filter(_.isCached).map(i => i.id -> i.memSize).toMap
      ref.fold(batch)
      spark.sparkContext.getRDDStorageInfo.filter(_.isCached)
        .filterNot(i => before.contains(i.id)).map(_.memSize).sum
    }
    val small = foldStorageDelta(30L)
    val big = foldStorageDelta(300L)
    assert(small > 0 && big > 0)
    assert(big <= 3 * small,
      s"fold checkpoint bytes must be batch-proportional: 30-doc index -> $small B, " +
        s"300-doc index -> $big B")
  }

  test("the segmented view recomputes NOTHING per gate: no aggregate anywhere in its component plans") {
    // the dropped-bucket table must be checkpointed at FOLD time — leaving
    // it lazy in the view would re-shuffle every distinct bucket's count on
    // every micro-batch gate (an O(index) per-gate cost the monolithic
    // index never paid). Sweep all published components for Aggregates.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val ref = new RefreshableCorpusIndex(Dedup.corpusIndex(docsDf(
      1L -> variant("u"), 2L -> variant("v"),
      3L -> "a plainly distinct document with its own words entirely")))
    ref.fold(docsDf(10L -> variant("w"),
      11L -> "another distinct fold document with fresh vocabulary inside"))
    val v = ref.current
    Seq("fps" -> v.fps, "sets" -> v.sets, "buckets" -> v.buckets,
      "fp_bloom" -> v.fpBloom, "bucket_bloom" -> v.bucketBloom,
      "oversized" -> v.oversized).foreach { case (name, df) =>
      val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      assert(aggs.isEmpty,
        s"view component '$name' must read checkpointed inputs, not re-aggregate: $aggs")
    }
  }

  test("segmented folds across in-memory compactions equal from-scratch (re-key after compaction too)") {
    val cap = 2
    val corpus0 = docsDf(
      10L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      12L -> variant("u"), 13L -> variant("v"),
      15L -> "completely different content about winter mountain hiking gear and maps")
    // 5 folds through maxSegments = 3 → at least one compaction mid-chain;
    // the LAST fold re-keys (5 < 10) AFTER a compaction reset the composed
    // remap, and family variants keep crossing the bucket cap
    val folds = Seq(
      docsDf(20L -> variant("w"),
        21L -> "fresh unique sentence with enough words to shingle comfortably today"),
      docsDf(30L -> variant("z"),
        31L -> "entirely new second fold text with plenty of distinct words inside"),
      docsDf(40L -> "third fold document with an unmistakably distinct vocabulary set"),
      docsDf(50L -> variant("q")),
      docsDf(5L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        51L -> "fifth fold brand new text keeping the chain honest and growing"))

    val ref = new RefreshableCorpusIndex(
      Dedup.corpusIndex(corpus0, bucketCap = cap), maxSegments = 3)
    folds.foreach(b => ref.fold(b))
    val union = folds.foldLeft(corpus0)(_ unionAll _)
    val scratch = Dedup.corpusIndex(union, bucketCap = cap)
    sameContents(ref.current, scratch)
    // the late re-key is live: a gate copy of the group reports rep 5
    val gate = docsDf(90L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val got = gateRows(Dedup.bestMatchAgainst(gate, ref.current))
    assert(got == gateRows(Dedup.bestMatchAgainst(gate, scratch)))
    assert(got.head._2 == Some(5L), s"post-compaction re-key must reach the gate: $got")
  }

  test("embed index: base + delta replay, compaction, and the flushable vector gate") {
    val e = operators.Tables.load(spark, sf(), "embeddings")
    val corpus0 = e.filter(pmod(col("vec_id"), lit(4)) === 0)
    val b1 = e.filter(pmod(col("vec_id"), lit(4)) === 1)
    val b2 = e.filter(pmod(col("vec_id"), lit(4)) === 2)

    val path = tmpDir("edelta-rt")
    Similarity.saveEmbedIndex(Similarity.embedIndex(corpus0), path)
    val ref = new RefreshableEmbedIndex(Similarity.loadEmbedIndex(spark, path))
    ref.fold(b1, deltaPath = Some(path))
    ref.fold(b2, deltaPath = Some(path))

    def qcSet(i: Similarity.EmbedIndex) =
      i.qc.collect().map(r => (r.getAs[Long]("vec_id"), r.getSeq[Long](1), r.getAs[Long]("nq"))).toSet
    def cbSet(i: Similarity.EmbedIndex) =
      i.cb.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("table"),
        r.getAs[Long]("bucket"))).toSet

    val loaded = Similarity.loadEmbedIndex(spark, path)
    val scratch = Similarity.embedIndex(e.filter(pmod(col("vec_id"), lit(4)) < 3))
    assert(qcSet(loaded) == qcSet(scratch) && cbSet(loaded) == cbSet(scratch))
    val gate = e.filter(pmod(col("vec_id"), lit(4)) === 3)
    val want = Similarity.embedNoveltyAgainst(gate, scratch).collect().toSeq
    assert(Similarity.embedNoveltyAgainst(gate, loaded).collect().toSeq == want)
    loaded.release()

    Similarity.compactEmbedIndex(spark, path)
    assert(IndexFiles.numbered(spark, path, "delta_").isEmpty)
    val compacted = Similarity.loadEmbedIndex(spark, path)
    assert(qcSet(compacted) == qcSet(scratch) && cbSet(compacted) == cbSet(scratch))
    assert(Similarity.embedNoveltyAgainst(gate, compacted).collect().toSeq == want)
    IndexFiles.delete(spark, path)

    // EmbedIngestGate.flush: an AvailableNow-style run (ONE batch, then
    // shutdown) must still fold its final batch — the bare-closure form
    // never did (the lag deferred every fold to a batch that never came)
    val p2 = tmpDir("egate-flush")
    val idx0 = Similarity.embedIndex(corpus0)
    Similarity.saveEmbedIndex(idx0, p2)
    val g = graft.streaming.StreamingSimilarity.novelAgainstIndexIngest(
      new RefreshableEmbedIndex(Similarity.loadEmbedIndex(spark, p2)),
      indexPath = Some(p2))
    val d1 = g(b1, 0L)
    val admitted = d1.filter(col("novel")).count()
    assert(admitted > 0)
    g.flush()
    // the flushed fold landed durably: a FRESH load contains b1's admissions
    val resumed = Similarity.loadEmbedIndex(spark, p2)
    assert(resumed.qc.count() == idx0.qc.count() + admitted,
      "flush must fold and persist the final batch's admissions")
    resumed.release()
    IndexFiles.delete(spark, p2)
  }
}
