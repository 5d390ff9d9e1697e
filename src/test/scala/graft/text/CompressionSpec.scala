package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** TextOps.withCompressionRatio — spec-gated (no SQL engine can
  * deflate): known-string pins, monotonicity, determinism, corpus
  * sanity. */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String): (Long, Long, Double) =
    TextOps.withCompressionRatio(Seq((1L, s)).toDF("id", "text"),
        "text", "ratio")
      .select("n_raw", "n_comp", "ratio")
      .as[(Long, Long, Double)].collect().head

  test("pure repetition compresses far below random-ish text") {
    val rep = one("ab" * 2000)
    val rnd = new scala.util.Random(4)
    val noisy = one((0 until 4000)
      .map(_ => (33 + rnd.nextInt(90)).toChar).mkString)
    assert(rep._1 == 4000 && noisy._1 == 4000)
    assert(rep._3 < 0.02, s"repetition ratio ${rep._3}")
    assert(noisy._3 > 0.5, s"noise ratio ${noisy._3}")
    assert(rep._2 < noisy._2)
  }

  test("empty and null text report ratio 0 with zero bytes") {
    assert(one("") == ((0L, 0L, 0.0)))
    val n = TextOps.withCompressionRatio(
        Seq((1L, null: String)).toDF("id", "text"), "text", "ratio")
      .select("n_raw", "n_comp", "ratio")
      .as[(Long, Long, Double)].collect().head
    assert(n == ((0L, 0L, 0.0)))
  }

  test("deterministic across runs and repartitioning") {
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text")
    val a = TextOps.withCompressionRatio(docs, "text", "ratio")
      .select("doc_id", "ratio").as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    val b = TextOps.withCompressionRatio(docs.repartition(7), "text",
        "ratio")
      .select("doc_id", "ratio").as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // the synthetic corpus is word-soup over a tiny vocabulary —
    // compressible but nowhere near the pure-repetition floor; very
    // short docs can exceed 1.0 (DEFLATE framing overhead)
    assert(a.forall { case (_, r) => r > 0.05 && r < 1.5 })
  }

  test("input columns and UTF-8 byte counting are preserved") {
    val out = TextOps.withCompressionRatio(
        Seq((7L, "src", "héllo")).toDF("id", "s", "text"), "text", "r")
    assert(out.columns.toSeq ==
      Seq("id", "s", "text", "n_raw", "n_comp", "r"))
    // é is 2 UTF-8 bytes
    assert(out.select("n_raw").as[Long].collect().head == 6L)
  }
}
