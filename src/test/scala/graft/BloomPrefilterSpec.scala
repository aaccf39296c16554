package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The novelty gate's Bloom semi-join reduction ([[Dedup.bloomWords]] /
  * [[Dedup.bloomFiltered]]): the contract that makes it safe to put in
  * front of the corpus-index joins is NO FALSE NEGATIVES — every key that
  * was fed into the filter must survive the probe; definite misses may be
  * pruned (that's the point), false positives are allowed (they just pay
  * the join). */
class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key survives; most foreign keys are pruned") {
    val logBits = 16
    val corpus = (0L until 2000L).map(i => s"corpus-key-$i").toDF("k")
    val words = Dedup.bloomWords(corpus, Seq(col("k")), logBits)
    // every inserted key survives the probe
    val kept = Dedup.bloomFiltered(corpus, Seq(col("k")), words, logBits)
    assert(kept.count() == 2000L, "a Bloom filter must never drop an inserted key")
    // foreign keys: almost all pruned (65536 bits / 2000 keys / 4 hashes ⇒
    // ~fp 2%; assert a loose bound so the spec isn't brittle)
    val foreign = (0L until 2000L).map(i => s"other-key-$i").toDF("k")
    val passed = Dedup.bloomFiltered(foreign, Seq(col("k")), words, logBits).count()
    assert(passed < 400, s"expected most definite misses pruned, got $passed/2000 through")
  }

  test("multi-column keys: (band, sig) probes match only as a pair") {
    val logBits = 16
    val pairs = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("band", "sig")
    val words = Dedup.bloomWords(pairs, Seq(col("band"), col("sig")), logBits)
    val probes = Seq((1L, 10L), (1L, 20L), (2L, 20L), (3L, 10L))
      .toDF("band", "sig")
    val through = Dedup.bloomFiltered(probes, Seq(col("band"), col("sig")), words, logBits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 10L), (2L, 20L)).subsetOf(through),
      "inserted pairs must survive")
    // crossed combinations are misses (tiny chance of a false positive with
    // 3 keys in 65536 bits — effectively zero; deterministic hashing makes
    // this reproducible, not flaky)
    assert(!through.contains((1L, 20L)) && !through.contains((3L, 10L)),
      "crossed (band, sig) combinations must be pruned")
  }

  test("gate result is identical with the prefilter in place (vs an index probed without blooms)") {
    val docs = Tables.load(spark, sf(), "documents")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val idx = Dedup.corpusIndex(corpus)
    // an all-bits-set bloom makes bloomFiltered pass everything — the
    // unfiltered gate, through the same code path
    val allSet = spark.range(0, (1L << idx.logBloomBits) / 64)
      .select(col("id").as("w"), lit(-1L).as("bits"))
    val open = idx.copy(fpBloom = allSet, bucketBloom = allSet)
    val withBloom = Dedup.bestMatchAgainst(batch, idx).orderBy("doc_id").collect()
    val without = Dedup.bestMatchAgainst(batch, open).orderBy("doc_id").collect()
    assert(withBloom.toSeq == without.toSeq,
      "the Bloom prune must be result-neutral")
    assert(withBloom.nonEmpty)
  }
}
