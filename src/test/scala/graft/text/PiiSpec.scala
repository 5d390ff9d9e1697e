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
}
