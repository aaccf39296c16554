package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** COMPOSITION probes for the text-side heuristics — the minhash-family
  * lesson generalized (NOTES_r10: hash-exact oracles replay the same
  * arithmetic on both engines, so a semantically DEGENERATE heuristic can
  * stay oracle-green for rounds; only driving real variants through the
  * operator and asserting its decisions discriminate catches that class).
  *
  * Each test crafts genuinely new text (not derived from the testdata) and
  * asserts the heuristic's BEHAVIOR: quality drops under real degradations,
  * the classifier margin separates prose from spam, language ID labels
  * held-out sentences correctly — and the one known blind spot is pinned
  * explicitly so a future weight change is a conscious decision.
  */
class TextHeuristicsCompositionSpec extends SparkSpec {
  import spark.implicits._

  private def docFrame(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))

  private val prose =
    "the quick brown fox jumps over a lazy dog and runs to the river " +
      "in search of cool water while birds sing in the morning light"

  test("quality score drops under real degradations of the same document") {
    // 1 = original; 2 = repetition spam (diversity collapses); 3 = the same
    // sentence with its stopwords stripped (stop_ratio collapses); 4 = a
    // 3-token fragment (length component collapses)
    val stripped = prose.split(' ')
      .filterNot(TextAnalysis.StopWords.contains).mkString(" ")
    val docs = docFrame(Seq(
      1L -> prose,
      2L -> Array.fill(prose.split(' ').length)("water").mkString(" "),
      3L -> stripped,
      4L -> "quick brown fox"))
    val score = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (degraded <- Seq(2L, 3L, 4L))
      assert(score(1L) > score(degraded),
        s"original ${score(1L)} must beat degraded #$degraded ${score(degraded)}")
    // non-degeneracy: the three degradations hit DIFFERENT components, so
    // their scores must not collapse to one value either
    assert(Seq(2L, 3L, 4L).map(score).distinct.size == 3)
  }

  test("quality classifier margin separates prose from spam and fragments") {
    val docs = docFrame(Seq(
      1L -> prose,
      2L -> ("the cat is on a mat and the dog is in the garden of " +
        "an old house with a red door and a tall tree"),
      // repetition spam: high length, near-zero diversity, no stopwords
      3L -> Array.fill(60)("buy").mkString(" "),
      // short repeated spam: neither diversity nor length rescues it
      4L -> "win win win free free"))
    val keep = TextAnalysis.qualityClassifier(docs)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep(1L) && keep(2L), "real prose must pass the margin")
    assert(!keep(3L), "repetition spam must be dropped")
    assert(!keep(4L), "short repeated spam must be dropped")
  }

  test("CLOSED BLIND SPOT (r13): the stopword floor rejects all-distinct junk, keeps short fragments") {
    // The r11–r12 pin documented that diversity 1.0 alone (weight 2.0)
    // nearly cancels the -2.2 bias, so a long stream of unique gibberish
    // passed the margin with zero stopwords. The r13 stopword-frequency
    // floor closes it: a >= 20-token document must carry at least one
    // stopword per 50 tokens (natural language always does), integer-exact
    // on both engines. Short fragments stay exempt — a 3-token title
    // legitimately has no function words.
    val junk = (1 to 60).map(i => s"xq${i}zv").mkString(" ")
    val keep = TextAnalysis.qualityClassifier(
        docFrame(Seq(
          9L -> junk,
          10L -> "click here now",
          // a 60-token REAL sentence stream keeps passing (stopword-rich)
          11L -> Array.fill(5)(prose).mkString(" ").split(' ').take(60).mkString(" "),
          // junk that sneaks ONE stopword into 60 tokens still fails the
          // floor (1 * 50 < 60)
          12L -> ("the " + (1 to 59).map(i => s"xq${i}zv").mkString(" ")))))
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!keep(9L), "the floor must reject long all-distinct junk")
    assert(keep(10L), "short fragments are exempt from the floor")
    assert(keep(11L), "stopword-bearing prose must keep passing")
    assert(!keep(12L), "one token of camouflage must not clear the floor")
  }

  test("stopword langId labels genuinely new sentences, all labels reachable") {
    val docs = Seq(
      (1L, "en", "the cat is on a mat and the dog is in the garden"),
      (2L, "es", "el perro y la casa de los vecinos que viven en madrid"),
      (3L, "de", "der hund und die katze das haus ist ein schönes zuhause"),
      (4L, "unknown", "12345 67890 xyzzy plugh"))
      .toDF("doc_id", "lang", "text")
    val pred = TextAnalysis.langId(docs)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(1L) == "en")
    assert(pred(2L) == "es")
    assert(pred(3L) == "de")
    assert(pred(4L) == "unknown")
    assert(pred.values.toSet.size == 4, "classifier must not collapse to one label")
  }

  test("the layered quality stack closes the classifier's pinned blind spots") {
    // Layering proof: the three filters catch DIFFERENT junk classes —
    // the r13 classifier floor and surprisal both reject the all-distinct
    // gibberish (defense in depth now, not the classifier's only rescue),
    // repetition rejects the repeated-token spam surprisal passes, and
    // the AND of the three keeps exactly the prose.
    val words = "the cat and a dog walk to an old house near one tall tree today".split(' ')
    def rotate(i: Int) = (words.drop(i % words.length) ++ words.take(i % words.length)).mkString(" ")
    val prose = (0 until 20).map(i => (i + 1).toLong -> rotate(i))
    val gibberish = 100L -> (1 to 20).map(i => s"zq${i}xv").mkString(" ")
    val spam = 101L -> Array.fill(60)("buy").mkString(" ")
    val docs = docFrame(prose :+ gibberish :+ spam)

    def keeps(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      df.select("doc_id", "keep").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cls = keeps(TextAnalysis.qualityClassifier(docs))
    val rep = keeps(TextAnalysis.repetition(docs))
    val sur = keeps(TextAnalysis.surprisal(docs))

    assert(!cls(100L), "the r13 stopword floor must catch the gibberish in the classifier itself")
    assert(!sur(100L), "surprisal must catch the gibberish (unique tokens = max ifreq)")
    assert(rep(100L), "repetition alone does NOT catch all-distinct gibberish")
    assert(!rep(101L), "repetition must catch the repeated-token spam")
    assert(sur(101L), "surprisal alone does NOT catch spam (a frequent token is unsurprising)")

    val composed = (cls.keySet ++ rep.keySet ++ sur.keySet)
      .filter(id => cls.getOrElse(id, false) && rep.getOrElse(id, false) && sur.getOrElse(id, false))
    assert(composed == prose.map(_._1).toSet,
      s"the composed stack must keep exactly the prose docs, got $composed")
  }

  test("contamination counts shared eval n-grams, ignores clean docs") {
    // doc_id ≡ 3 (mod 97) is the eval side; doc 1 quotes a 5-trigram span
    // of it, doc 2 shares nothing. The probe checks the DECISION shape the
    // oracle row can't: a contaminated doc surfaces with the right count,
    // a clean doc does not surface at all.
    val docs = docFrame(Seq(
      1L -> "students found the secret benchmark answer is forty two online yesterday",
      2L -> "a completely unrelated paragraph about gardening and soil quality",
      3L -> "the secret benchmark answer is forty two exactly"))
    val rows = TextAnalysis.contamination(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_contaminated")).toMap
    assert(rows.keySet == Set(1L), s"only the contaminated doc may surface: $rows")
    assert(rows(1L) == 5L,
      s"the five shared trigrams of the quoted span must all count: $rows")
  }

  test("trigram langId generalizes to held-out sentences it never trained on") {
    // Train on labeled sentences; the held-out docs carry lang='xx' so they
    // contribute NO trigrams to any en/es/de profile (profiles group by
    // lang; the pivot reads only the three real labels) — a true
    // generalization probe, unlike the registry row which scores in-corpus.
    val train = Seq(
      (1L, "en", "the weather is cold and the wind blows over the hills today"),
      (2L, "en", "she walked to the market and bought bread with the last coins"),
      (3L, "en", "a good book is the best friend on a long winter evening"),
      (4L, "es", "la lluvia cae sobre los campos y el viento mueve las hojas"),
      (5L, "es", "ella caminó hacia el mercado y compró pan con las últimas monedas"),
      (6L, "es", "un buen libro es el mejor amigo en las noches de invierno"),
      (7L, "de", "der regen fällt über die felder und der wind bewegt die blätter"),
      (8L, "de", "sie ging zum markt und kaufte brot mit den letzten münzen"),
      (9L, "de", "ein gutes buch ist der beste freund an langen winterabenden"))
    val heldOut = Seq(
      (101L, "xx", "the children played in the garden until the evening came"),
      (102L, "xx", "los niños jugaron en el jardín hasta que llegó la noche"),
      (103L, "xx", "die kinder spielten im garten bis der abend kam"))
    val docs = (train ++ heldOut).toDF("doc_id", "lang", "text")
    val pred = TextAnalysis.langIdTrigram(docs)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(101L) == "en", s"held-out english got ${pred(101L)}")
    assert(pred(102L) == "es", s"held-out spanish got ${pred(102L)}")
    assert(pred(103L) == "de", s"held-out german got ${pred(103L)}")
  }
}
