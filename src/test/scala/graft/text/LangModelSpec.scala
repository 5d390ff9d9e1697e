package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LangModel bigram extraction, training counts, smoothed perplexity,
  * and novelty — hand-computed oracles. The q89/q90 gates pin the same
  * computation against DuckDB at sf0.01/sf0.1. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (0L, "the cat sat"),
    (2L, "the cat ran"),
    (4L, "a dog sat")).toDF("doc_id", "text")

  test("bigrams explode in-document adjacencies only") {
    val b = LangModel.bigrams(train, "doc_id", "text")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._2, r._3))
    assert(b.toSeq == Seq(
      (0L, "cat", "sat"), (0L, "the", "cat"),
      (2L, "cat", "ran"), (2L, "the", "cat"),
      (4L, "a", "dog"), (4L, "dog", "sat")))
  }

  test("single-word and empty docs contribute no bigrams") {
    val df = Seq((0L, "solo"), (1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(LangModel.bigrams(df, "doc_id", "text").count() === 0)
  }

  test("trained counts and vocabulary match hand computation") {
    val m = LangModel.trainBigrams(train, "text")
    val c = m.counts.as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(c == Map(
      ("the", "cat") -> 2L, ("cat", "sat") -> 1L, ("cat", "ran") -> 1L,
      ("a", "dog") -> 1L, ("dog", "sat") -> 1L))
    // vocab: the, cat, sat, ran, a, dog
    assert(m.vocabSize === 6L)
  }

  test("perplexity matches the closed-form smoothed computation") {
    val m = LangModel.trainBigrams(train, "text")
    // doc "the cat sat": P(cat|the) = (2+.5)/(2+3), P(sat|cat) = (1+.5)/(2+3)
    val expected = BigDecimal(
      -(math.log(2.5 / 5.0) / math.log(2.0) +
        math.log(1.5 / 5.0) / math.log(2.0)) / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = LangModel.scorePerplexity(
        Seq((1L, "the cat sat")).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .as[(Long, Long, Double)].head()
    assert(got._1 === 1L)
    assert(got._2 === 2L)
    assert(got._3 === expected)
  }

  test("unseen words fall back to the uniform smoothed floor") {
    val m = LangModel.trainBigrams(train, "text")
    // "zig zag": c12 = 0, c1 = 0 -> P = .5/(0 + .5*6) = 1/6 -> log2 6
    val got = LangModel.scorePerplexity(
        Seq((1L, "zig zag")).toDF("doc_id", "text"), "doc_id", "text", m)
      .as[(Long, Long, Double)].head()
    val expected = BigDecimal(math.log(6.0) / math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._3 === expected)
  }

  test("novelty counts seen vs total bigrams exactly") {
    val m = LangModel.trainBigrams(train, "text")
    val got = LangModel.bigramNovelty(
        Seq((1L, "the cat sat beside the cat"), (3L, "zig zag"))
          .toDF("doc_id", "text"),
        "doc_id", "text", m)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1 bigrams: the-cat(seen), cat-sat(seen), sat-beside, beside-the,
    //                the-cat(seen)
    assert(got == Seq((1L, 5L, 3L), (3L, 1L, 0L)))
  }
}
