package graft.text

import graft.SparkSpec

/** Chunker — window/stride arithmetic, tails, degenerate sizes.
  * q108 pins the corpus pass against DuckDB. */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, stride: Int) =
    Chunker.chunkByTokens(Seq((1L, text)).toDF("id", "text"),
        "id", "text", size, stride)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(t => (t._2, t._3, t._4, t._5)).toSeq.sortBy(_._1)

  test("overlapping windows advance by stride, tail is short") {
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = chunks(words, size = 4, stride = 3)
    assert(out == Seq(
      (0L, 0L, 3L, "w1 w2 w3 w4"),
      (1L, 3L, 6L, "w4 w5 w6 w7"),
      (2L, 6L, 9L, "w7 w8 w9 w10"),
      (3L, 9L, 9L, "w10")))
  }

  test("stride == size gives disjoint chunks") {
    val words = (1 to 6).map(i => s"w$i").mkString(" ")
    val out = chunks(words, size = 3, stride = 3)
    assert(out == Seq(
      (0L, 0L, 2L, "w1 w2 w3"),
      (1L, 3L, 5L, "w4 w5 w6")))
  }

  test("document shorter than one window emits a single chunk") {
    assert(chunks("only two", size = 32, stride = 24) ==
      Seq((0L, 0L, 1L, "only two")))
  }

  test("tokenization lowercases and collapses whitespace") {
    assert(chunks("  A   B\tC ", size = 2, stride = 2) ==
      Seq((0L, 0L, 1L, "a b"), (1L, 2L, 2L, "c")))
  }

  test("invalid size/stride rejected") {
    intercept[IllegalArgumentException] {
      Chunker.chunkByTokens(Seq((1L, "x")).toDF("id", "text"),
        "id", "text", size = 4, stride = 5)
    }
  }
}
