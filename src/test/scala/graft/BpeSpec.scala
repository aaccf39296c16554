package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.{Tables, TextAnalysis}

/** The learned-BPE trainer checked three independent ways: the DuckDB
  * oracle replays it cross-ENGINE (registry gate), this spec replays it
  * cross-PARADIGM (a pure-Scala reference trainer over the same word
  * table), and a hand-computed fixture pins the greedy-left merge order
  * and the pair-exhaustion edge the big corpus never reaches. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference trainer: identical contract — (count DESC, pair ASC) tie
    * break, left-greedy single-pass merge application. */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Vector[String]]) = {
    def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.tail.foldLeft(Vector(syms.head)) { (acc, s) =>
        if (acc.last == a && s == b) acc.init :+ (a + b) else acc :+ s
      }
    var vocab = words.map { case (w, _) => w -> w.map(_.toString).toVector }
    val merges = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (w, syms) =>
        syms.zip(syms.tail).foreach(p => counts(p) += words(w))
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((r.toLong, a, b, c))
        vocab = vocab.map { case (w, syms) => w -> applyMerge(syms, a, b) }
        r += 1
      }
    }
    (merges.toSeq, vocab)
  }

  private def corpusWords: Map[String, Long] =
    Tables.load(spark, sf(), "documents").select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

  test("trained merges equal an independent pure-Scala replay on the real corpus") {
    val docs = Tables.load(spark, sf(), "documents")
    val got = TextAnalysis.bpeMerges(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val (want, _) = refTrain(corpusWords, TextAnalysis.BpeRounds)
    assert(got.length == TextAnalysis.BpeRounds, "the corpus must sustain all rounds")
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("per-doc token counts equal the reference encoding") {
    val docs = Tables.load(spark, sf(), "documents")
    val (_, refVocab) = refTrain(corpusWords, TextAnalysis.BpeRounds)
    val got = TextAnalysis.bpeTokens(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val raw = docs.select("doc_id", "text").collect()
    assert(got.size == raw.length)
    raw.foreach { r =>
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      val nSub = words.map(w => refVocab(w).size.toLong).sum
      val (nw, nb, ratio) = got(r.getLong(0))
      assert(nw == words.length && nb == nSub,
        s"doc ${r.getLong(0)}: ($nw, $nb) vs (${words.length}, $nSub)")
      assert(ratio == nSub.toDouble / words.length)
      assert(nb >= nw, "a word is at least one subword")
    }
  }

  test("greedy-left order and pair exhaustion: the hand-computed aaab fixture") {
    // words: aaab x3, ab x2. Round 1: (a,a)=6 beats (a,b)=5; the GREEDY-LEFT
    // merge turns aaab into [aa, a, b] (not [a, aa, b]), which is what makes
    // round 2's counts (a,b)=5 > (aa,a)=3. Round 3 merges (aa,ab)=3 and the
    // vocabulary is then fully merged: rounds 4..8 have no pairs, and BOTH
    // engines degrade identically to a 3-row merge table.
    val docs = Seq((0L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, "a", "a", 6L), (2L, "a", "b", 5L), (3L, "aa", "ab", 3L)),
      s"got $got")
    // the tokens query over the exhausted vocabulary: every word fully
    // merged to one symbol
    val toks = TextAnalysis.bpeTokens(docs).collect()
    assert(toks.length == 1 && toks(0).getLong(1) == 5L && toks(0).getLong(2) == 5L)
  }
}
