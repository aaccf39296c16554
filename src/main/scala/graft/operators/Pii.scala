package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection + redaction over free text — the scrub pass every
  * training-data pipeline runs before text enters a corpus (emails, IPs
  * and long account-number-shaped digit runs are the classic C4/Dolma-style
  * regex tier; ML-based NER tiers sit on top of exactly this plumbing).
  *
  * Patterns are deliberately restricted to the regex subset whose semantics
  * are identical between Java's engine (Spark codegen) and RE2 (DuckDB,
  * Go): no lookaround, no backreferences, ASCII word boundaries only — so
  * the oracle replays the scrub bit-for-bit and the operator stays inside
  * whole-stage codegen (`regexp_replace`/`regexp_count` are codegen'd;
  * never a UDF).
  *
  * Scale shape: pure map-side — zero shuffles, no state; at 100 TB this is
  * a scan-bound pass that fuses into whatever filter/projection runs next
  * (see [[CurationPipeline]]'s fused single-scan predicate).
  *
  * Redaction is SEQUENTIAL (email → ipv4 → long-number) so an address that
  * embeds a dotted quad or a digit run is consumed once by the widest
  * pattern first; the placeholder tokens contain no digits or `@`, so a
  * replacement can never re-match a later pattern. The per-type counts are
  * computed on the ORIGINAL text (raw detector hit counts, the number a
  * PII audit reports), which can exceed what redaction consumes when
  * patterns overlap — both sides compute both quantities the same way.
  */
object Pii {

  /** RFC-casual email shape; RE2-safe (character classes + counted reps). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad with ASCII word boundaries. Octet range is deliberately
    * not enforced (25[0-5]|…) — a scrub pass prefers false positives like
    * `999.1.1.1` over leaked addresses, and the simpler pattern stays
    * linear-time in both engines. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** 7+ digit runs: phone / account / SSN-shaped. Timestamps' 6-digit
    * microsecond fields and 4-digit ports stay below the threshold. */
  val LongNumRe = "\\b\\d{7,}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val NumTag = "<NUM>"

  /** The documents-table registry form: per-doc detector counts + the
    * redacted text — the corpus-side scrub pass (the log side is
    * `log_pii_scrub`). */
  def documentsScrub(docs: DataFrame): DataFrame =
    scrub(Tables.fanOut(docs), "text")
      .select("doc_id", "n_email", "n_ipv4", "n_num", "redacted")
      .orderBy("doc_id")

  /** DuckDB oracle for [[documentsScrub]] — the same RE2-safe patterns,
    * counts on the original text, sequential replace. */
  val documentsScrubSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(text, '$LongNumRe')) AS BIGINT) AS n_num,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '$EmailTag', 'g'),
       |    '$Ipv4Re', '$IpTag', 'g'),
       |    '$LongNumRe', '$NumTag', 'g') AS redacted
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Add `n_email`, `n_ipv4`, `n_num` (raw hit counts on the original
    * text) and `redacted` (sequentially scrubbed text) to `df`. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_email", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ipv4", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_num", regexp_count(t, lit(LongNumRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, EmailTag),
            Ipv4Re, IpTag),
          LongNumRe, NumTag))
  }
}
