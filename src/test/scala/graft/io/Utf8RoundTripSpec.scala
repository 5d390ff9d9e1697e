package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import graft.SparkSpec

/** UTF-8 torture round-trip (reference `tests/test.py:203-245` /
  * `tests/generate_complex_utf8.py`): multilingual + 4-byte emoji
  * values must survive LDIF import → engine → sink → re-read intact. */
class Utf8RoundTripSpec extends SparkSpec {

  // "I can eat glass" corpus excerpts incl. 4-byte emoji (reference
  // repairs surrogates client-side, lwetl/jdbc.py:218-226; on the JVM
  // UTF-8 just works, this guards it stays that way)
  private val corpus = Seq(
    "en" -> "I can eat glass and it doesn't hurt me.",
    "fr" -> "Je peux manger du verre, ça ne me fait pas mal.",
    "el" -> "Μπορώ να φάω σπασμένα γυαλιά χωρίς να πάθω τίποτα.",
    "sa" -> "काचं शक्नोम्यत्तुम् । नोपहिनस्ति माम् ॥",
    "zh" -> "我能吞下玻璃而不伤身体。",
    "emoji" -> "🍷🥂 I can eat 🥃 glass 🍸😀💯")

  test("LDIF (base64) → DataFrame → csv sink → parquet keeps every codepoint") {
    import spark.implicits._
    val ldif = corpus.map { case (lang, text) =>
      val b64 = Base64.getEncoder.encodeToString(text.getBytes(StandardCharsets.UTF_8))
      s"indx: ${lang.hashCode}\nlang: $lang\nvalue:: $b64\n"
    }.mkString("\n")
    val f = Files.createTempFile("graft", ".ldif")
    Files.write(f, ldif.getBytes(StandardCharsets.UTF_8))

    val df = LdifImport.read(spark, f.toString)
    val got = df.select("lang", "value").as[(String, String)].collect().toMap
    corpus.foreach { case (lang, text) => assert(got(lang) == text, s"lang=$lang") }

    // through a csv sink and back
    val out = Files.createTempDirectory("graft").toString + "/utf8"
    Sinks.writeCsv(df.select("lang", "value"), out)
    val back = spark.read.option("header", "true").option("sep", ";").csv(out)
      .as[(String, String)].collect().toMap
    corpus.foreach { case (lang, text) => assert(back(lang) == text, s"csv lang=$lang") }

    // and through parquet (the engine's native format)
    val pq = Files.createTempDirectory("graft").toString + "/utf8p"
    df.select("lang", "value").write.parquet(pq)
    val back2 = spark.read.parquet(pq).as[(String, String)].collect().toMap
    corpus.foreach { case (lang, text) => assert(back2(lang) == text, s"pq lang=$lang") }
  }

  test("binary JPEG-ish payload round-trips through LDIF → binaryColumn") {
    // reference test_binary_io round-trips tests/resources/jdbc.jpg;
    // same shape with a synthetic payload incl. every byte value
    val payload = Array.tabulate[Byte](256)(i => i.toByte)
    val b64 = Base64.getEncoder.encodeToString(payload)
    val f = Files.createTempFile("graft", ".ldif")
    Files.write(f, s"name: img1\nphoto:: $b64\n".getBytes(StandardCharsets.UTF_8))
    val df = LdifImport.binaryColumn(LdifImport.read(spark, f.toString), "photo")
    val got = df.collect().head.getAs[Array[Byte]]("photo")
    assert(got.toSeq == payload.toSeq)
  }
}
