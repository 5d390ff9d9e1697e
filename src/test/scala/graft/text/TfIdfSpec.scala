package graft.text

import graft.SparkSpec

/** TfIdf.topKTerms — closed-form hand computation on a tiny corpus,
  * ranking/tie-break edges. The q99 gate pins the full pipeline
  * against DuckDB's window-rank formulation at sf0.01/sf0.1. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // N=3 docs; "apple" in 1 doc, "banana" in 2, "common" in all 3
  private val docs = Seq(
    (1L, "apple apple common banana"),
    (2L, "banana common common"),
    (3L, "common")).toDF("id", "text")

  private def idf(df: Long): Double =
    math.log((3 + 1.0) / (df + 1.0)) + 1.0

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scores match the closed-form smoothed tf-idf") {
    val out = TfIdf.topKTerms(docs, "id", "text", 5)
      .as[(Long, Long, String, Long, Long, Double)].collect()
      .map(t => (t._1, t._3) -> (t._4, t._5, t._6)).toMap
    assert(out((1L, "apple")) == ((2L, 1L, r6(2 * idf(1)))))
    assert(out((1L, "banana")) == ((1L, 2L, r6(1 * idf(2)))))
    assert(out((1L, "common")) == ((1L, 3L, r6(1 * idf(3)))))
    assert(out((3L, "common")) == ((1L, 3L, r6(1 * idf(3)))))
  }

  test("rank orders by score desc, then term asc; k truncates") {
    val out = TfIdf.topKTerms(docs, "id", "text", 2)
    val d1 = out.filter($"id" === 1L)
      .orderBy($"rank").select("term").as[String].collect().toSeq
    // doc1: apple tf=2 df=1 (highest), banana tf=1 df=2, common tf=1 df=3
    assert(d1 == Seq("apple", "banana"))
    assert(out.count() == 2 + 2 + 1)
  }

  test("equal-score terms tie-break alphabetically") {
    val two = Seq((1L, "zeta alpha"), (2L, "other words")).toDF("id", "text")
    val d1 = TfIdf.topKTerms(two, "id", "text", 5)
      .filter($"id" === 1L).orderBy($"rank")
      .select("term").as[String].collect().toSeq
    assert(d1 == Seq("alpha", "zeta"))
  }
}
