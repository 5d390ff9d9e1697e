package graft.ops

import graft.SparkSpec

/** Profile.datasetCard / lengthHistogram — hand-computed card on a
  * tiny corpus; q124/q125 pin the full card against DuckDB. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "web", "en", "one two three four"),     // 4 tokens, 18 chars
    (2L, "web", "en", "five six"),               // 2 tokens, 8 chars
    (3L, "web", "de", "sieben"),                 // 1 token, 6 chars
    (4L, "book", "en", ""),                      // 0 tokens
    (5L, "book", "en", "eight nine ten")         // 3 tokens, 14 chars
  ).toDF("id", "source", "lang", "text")

  test("datasetCard: counts, volumes and 6dp shares per (source, lang)") {
    val card = Profile.datasetCard(docs, "source", "lang", "text")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(card == Seq(
      ("book", "en", 2L, 3L, 14L, 0.4, 0.3),
      ("web", "de", 1L, 1L, 6L, 0.2, 0.1),
      ("web", "en", 2L, 6L, 26L, 0.4, 0.6)))
  }

  test("lengthHistogram: power-of-two buckets, empty docs at 0") {
    val h = Profile.lengthHistogram(docs, "text")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // tokens: 4 -> bucket 4; 2 -> 2; 1 -> 1; 0 -> 0; 3 -> 2
    assert(h == Seq((0L, 1L), (1L, 1L), (2L, 2L), (4L, 1L)))
  }

  test("lengthHistogram: exact at power-of-two boundaries") {
    val d = Seq((1L, Seq.fill(8)("w").mkString(" ")),   // 8 -> 8
      (2L, Seq.fill(7)("w").mkString(" ")),             // 7 -> 4
      (3L, Seq.fill(1024)("w").mkString(" ")))          // 1024 -> 1024
      .toDF("id", "text")
    val h = Profile.lengthHistogram(d, "text")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(h == Seq((4L, 1L), (8L, 1L), (1024L, 1L)))
  }
}
