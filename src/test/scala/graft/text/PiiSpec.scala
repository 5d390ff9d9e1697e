package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pii.redact / withRedaction — placeholder substitution, counts,
  * family order, non-PII preservation. The q83 gate pins the chain
  * against DuckDB's RE2 regexp_replace at sf0.01/sf0.1 (the patterns
  * are restricted to the Java∩RE2 regex subset on purpose). */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Pii.redact(col("t"))).as[String].collect().head

  test("each family redacts to its placeholder") {
    assert(redactOne("mail bob.smith+x@corp.example.com now") ==
      "mail <EMAIL> now")
    assert(redactOne("call 555-123-4567 today") == "call <PHONE> today")
    assert(redactOne("host 192.168.0.1 down") == "host <IP> down")
  }

  test("multiple matches and mixed families in one text") {
    assert(redactOne("a@b.io and c@d.org via 10.0.0.1 or 555.123.4567") ==
      "<EMAIL> and <EMAIL> via <IP> or <PHONE>")
  }

  test("phone runs before ipv4 (dotted 3-3-4 digits is a phone)") {
    // 555.123.4567 matches both families' shapes; order makes it PHONE
    assert(redactOne("x 555.123.4567 y") == "x <PHONE> y")
  }

  test("email swallows its own dotted digits before ipv4 can") {
    assert(redactOne("u.10.0.0.1@ex.com") == "<EMAIL>")
  }

  test("non-PII text is unchanged") {
    val s = "version 1.2 costs 12.50 at 3pm; see section 4.5.6"
    assert(redactOne(s) == s)
  }

  test("withRedaction adds redacted column + per-family audit counts") {
    val df = Seq(
      (1L, "a@b.io c@d.fr 10.0.0.1"),
      (2L, "555-123-4567"),
      (3L, "clean")).toDF("id", "text")
    val out = Pii.withRedaction(df, "text", "red")
    assert(out.columns.toSeq ==
      Seq("id", "text", "red", "n_email", "n_phone", "n_ipv4"))
    val rows = out.select("id", "red", "n_email", "n_phone", "n_ipv4")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "<EMAIL> <EMAIL> <IP>", 2L, 0L, 1L),
      (2L, "<PHONE>", 0L, 1L, 0L),
      (3L, "clean", 0L, 0L, 0L)))
  }

  test("unknown count family rejected") {
    intercept[IllegalArgumentException] {
      Pii.countMatches(col("x"), "ssn")
    }
  }

  // ----------------------------------------------- extended families

  private def boolOf(c: org.apache.spark.sql.Column, s: String): Boolean =
    Seq(s).toDF("t").select(c).as[Boolean].collect().head

  test("luhnValid accepts the ISO test PANs, rejects off-by-one") {
    // 4111111111111111 is the canonical Luhn-valid test number
    assert(boolOf(Pii.luhnValid(col("t")), "4111111111111111"))
    assert(boolOf(Pii.luhnValid(col("t")), "4111-1111-1111-1111"))
    assert(boolOf(Pii.luhnValid(col("t")), "4111 1111 1111 1111"))
    assert(boolOf(Pii.luhnValid(col("t")), "5500005555555559"))
    assert(!boolOf(Pii.luhnValid(col("t")), "4111111111111112"))
    assert(!boolOf(Pii.luhnValid(col("t")), "4111-1111-1111-1110"))
  }

  test("ibanValid accepts published example IBANs, rejects mutations") {
    // the two standard registry examples (DE / GB with letters in BBAN)
    assert(boolOf(Pii.ibanValid(col("t")), "DE89370400440532013000"))
    assert(boolOf(Pii.ibanValid(col("t")), "GB82WEST12345698765432"))
    assert(!boolOf(Pii.ibanValid(col("t")), "DE89370400440532013001"))
    assert(!boolOf(Pii.ibanValid(col("t")), "GB83WEST12345698765432"))
  }

  test("extended redaction: only Luhn-valid cards are replaced") {
    val df = Seq(
      (1L, "pay 4111-1111-1111-1111 now"),     // valid → redact
      (2L, "order 4111-1111-1111-1112 ref")    // shape only → keep
    ).toDF("id", "text")
    val out = Pii.withExtendedRedaction(df, "text", "red")
      .select("id", "red", "n_cc", "n_cc_valid")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "pay <CC> now", 1L, 1L),
      (2L, "order 4111-1111-1111-1112 ref", 1L, 0L)))
  }

  test("extended redaction: SSN + IBAN shapes, validity audit") {
    val df = Seq(
      (1L, "ssn 123-45-6789 acct DE89370400440532013000 ok"),
      (2L, "acct DE89370400440532013001 bad check"),
      (3L, "phone 555-123-4567 is 3-3-4, not an SSN")).toDF("id", "text")
    val out = Pii.withExtendedRedaction(df, "text", "red")
      .select("id", "red", "n_ssn", "n_iban", "n_iban_valid")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // IBAN redaction is shape-based (low FP shape); validity is audit-only
    assert(out == Seq(
      (1L, "ssn <SSN> acct <IBAN> ok", 1L, 1L, 1L),
      (2L, "acct <IBAN> bad check", 0L, 1L, 0L),
      (3L, "phone 555-123-4567 is 3-3-4, not an SSN", 0L, 0L, 0L)))
  }

  test("luhnValid matches an independent fold on 300 random digit runs") {
    val rnd = new scala.util.Random(42)
    val cands = Seq.fill(300)(13 + rnd.nextInt(7))
      .map(n => Seq.fill(n)(rnd.nextInt(10)).mkString)
    def ref(s: String): Boolean = {
      val t = s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      t % 10 == 0
    }
    val got = cands.toDF("t")
      .select(col("t"), Pii.luhnValid(col("t")))
      .as[(String, Boolean)].collect().toMap
    cands.foreach(c => assert(got(c) == ref(c), s"PAN $c"))
    // sanity: the sample contains both outcomes
    assert(got.values.exists(identity) && got.values.exists(!_))
  }

  test("ibanValid matches BigInteger mod-97 on 300 random IBANs") {
    val rnd = new scala.util.Random(7)
    val cands = Seq.fill(300) {
      val cc = Seq.fill(2)(('A' + rnd.nextInt(26)).toChar).mkString
      val chk = f"${rnd.nextInt(100)}%02d"
      val bban = Seq.fill(12 + rnd.nextInt(8))(
        if (rnd.nextBoolean()) ('0' + rnd.nextInt(10)).toChar
        else ('A' + rnd.nextInt(26)).toChar).mkString
      cc + chk + bban
    }
    def ref(s: String): Boolean = {
      val r = s.drop(4) + s.take(4)
      val num = r.flatMap(c =>
        if (c.isDigit) c.toString else (c - 'A' + 10).toString)
      new java.math.BigInteger(num).mod(
        java.math.BigInteger.valueOf(97)).intValue == 1
    }
    val got = cands.toDF("t")
      .select(col("t"), Pii.ibanValid(col("t")))
      .as[(String, Boolean)].collect().toMap
    cands.foreach(c => assert(got(c) == ref(c), s"IBAN $c"))
  }

  test("extended redaction: multiple valid cards all replaced") {
    val df = Seq((1L,
      "a 4111111111111111 b 5500-0055-5555-5559 c 1234123412341234 d"))
      .toDF("id", "text")
    val out = Pii.withExtendedRedaction(df, "text", "red")
      .select("red", "n_cc", "n_cc_valid")
      .as[(String, Long, Long)].collect().head
    assert(out == ("a <CC> b <CC> c 1234123412341234 d", 3L, 2L))
  }
}
