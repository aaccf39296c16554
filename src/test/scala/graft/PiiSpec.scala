package graft

import org.apache.spark.sql.Row

import graft.operators.Pii

/** [[graft.operators.Pii]] on crafted fixtures — the synthetic corpora only
  * exercise the IPv4/long-number tiers, so emails, overlaps, boundary cases
  * and idempotency are pinned here. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(texts: String*): Seq[Row] =
    Pii.scrub(texts.toDF("text"), "text")
      .select("text", "n_email", "n_ipv4", "n_num", "redacted")
      .collect().toSeq

  test("email, ipv4 and long-number tiers redact independently") {
    val Seq(r) = scrub("mail bob.smith+x@ex-ample.co.uk from 10.0.0.8:9017 acct 12345678")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L)))
    assert(r.getString(4) == "mail <EMAIL> from <IP>:9017 acct <NUM>")
  }

  test("multiple hits per line are all redacted") {
    val Seq(r) = scrub("a@b.co c@d.org 1.2.3.4 5.6.7.8 1234567 7654321")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 2L, 2L)))
    assert(r.getString(4) == "<EMAIL> <EMAIL> <IP> <IP> <NUM> <NUM>")
  }

  test("sequential order: an email consumes its embedded dotted quad and digit run") {
    val Seq(r) = scrub("user12345678@10.0.0.8.example.com called")
    // raw counts see the overlapping ipv4/number inside the address; the
    // redaction consumes the whole address as one email first
    assert(r.getLong(1) == 1L)
    assert(r.getString(4) == "<EMAIL> called")
  }

  test("boundaries: timestamps, ports and short runs stay untouched") {
    val clean = "2024.01.01 00:00:07.179575 [ 108 ] port 9017 in 0.500 sec., 700021 rows"
    val Seq(r) = scrub(clean)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((0L, 0L, 0L)))
    assert(r.getString(4) == clean)
  }

  test("scrub is idempotent: placeholders never re-match") {
    val once = Pii.scrub(Seq("x a@b.co 1.2.3.4 9876543 y").toDF("text"), "text")
      .select($"redacted".as("text"))
    val twice = Pii.scrub(once, "text").select("redacted").as[String].head()
    assert(twice == "x <EMAIL> <IP> <NUM> y")
  }

  test("rendered log corpus: every non-orphan initial line carries exactly one ip") {
    val lines = graft.operators.LogRender.lines(
      graft.operators.Tables.events(spark, sf()))
    val scrubbed = Pii.scrub(lines, "value")
    val initials = scrubbed.filter($"seq" % 8 <= 1)
    assert(initials.filter($"n_ipv4" =!= 1L).count() == 0L)
    assert(initials.filter(!$"redacted".contains("(from <IP>:")).count() == 0L)
    // non-initial lines never contain an address
    assert(scrubbed.filter($"seq" % 8 > 1).filter($"n_ipv4" =!= 0L).count() == 0L)
  }

  test("documentsScrub: the corpus-side registry form detects and redacts (the oracle corpus is PII-free, so the fixture carries the semantics)") {
    import spark.implicits._
    import graft.operators.Pii
    val docs = Seq(
      (1L, "contact alice.b+spam@ex-ample.org or 10.1.2.3 re acct 12345678"),
      (2L, "clean text with port 9000 and ts 123456 stays untouched"),
      (3L, "two mails a@b.io c@d.co and 999.1.1.1")
    ).toDF("doc_id", "text")
    val out = Pii.documentsScrub(docs).collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_email") == 1 && r1.getAs[Long]("n_ipv4") == 1 &&
      r1.getAs[Long]("n_num") == 1)
    assert(r1.getAs[String]("redacted") ==
      "contact <EMAIL> or <IP> re acct <NUM>")
    val r2 = out(1)
    assert(r2.getAs[Long]("n_email") == 0 && r2.getAs[Long]("n_ipv4") == 0 &&
      r2.getAs[Long]("n_num") == 0)
    assert(r2.getAs[String]("redacted") ==
      "clean text with port 9000 and ts 123456 stays untouched")
    val r3 = out(2)
    assert(r3.getAs[Long]("n_email") == 2 && r3.getAs[Long]("n_ipv4") == 1)
    assert(r3.getAs[String]("redacted") == "two mails <EMAIL> <EMAIL> and <IP>")
  }
}
