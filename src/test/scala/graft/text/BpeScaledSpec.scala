package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The scale-path BPE implementations must be EXACT equivalents of
  * their expression-chain originals:
  *  - withBpeSegmentationPartitioned / withBpeTokenIdsPartitioned
  *    (broadcast-rank greedy mapPartitions applier) vs
  *    withBpeSegmentation / withBpeTokenIds — same output on a real
  *    trained table, held-out split included;
  *  - trainBpeBatched (provably-exact candidate-prefix batching) vs
  *    trainBpe — identical merge tables, every (step, pair, count).
  * The q85/q86/q88 gates additionally hash all three against the
  * original q77/q78/q76 DuckDB oracles at sf0.01/sf0.1. */
class BpeScaledSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame =
    Tables.load(spark, sf(), "documents").select(col("doc_id"), col("text"))
  private lazy val train = docs.filter(col("doc_id") % 2 === 0)
  private lazy val heldOut = docs.filter(col("doc_id") % 2 === 1)
  private lazy val merges = TextOps.trainBpe(train, "text", numMerges = 12)

  test("partitioned segmentation == expression-chain segmentation (held-out sf0.001)") {
    val key = (r: (Long, Long, String)) => r._1
    val expr = TextOps.withBpeSegmentation(
        heldOut, "text", merges, "seg", "n_bpe_tokens")
      .select("doc_id", "n_bpe_tokens", "seg")
      .as[(Long, Long, String)].collect().sortBy(key).toSeq
    val part = TextOps.withBpeSegmentationPartitioned(
        heldOut, "text", merges, "seg", "n_bpe_tokens")
      .select("doc_id", "n_bpe_tokens", "seg")
      .as[(Long, Long, String)].collect().sortBy(key).toSeq
    assert(part == expr)
    assert(expr.nonEmpty)
  }

  test("tokenizer artifact: save/load restores merges + vocab, encode identical") {
    val vocab = TextOps.bpeVocab(train, "text", merges)
    val dir = java.nio.file.Files.createTempDirectory("bpe_art").toString
    TextOps.saveTokenizer(spark, s"$dir/tok", merges, vocab)
    val (m2, v2) = TextOps.loadTokenizer(spark, s"$dir/tok")
    assert(m2 == merges && v2 == vocab)
    val a = TextOps.withBpeTokenIdsPartitioned(heldOut, "doc_id", "text",
        merges, vocab)
      .as[(Long, Int, String, Int)].collect().sortBy(t => (t._1, t._2)).toSeq
    val b = TextOps.withBpeTokenIdsPartitioned(heldOut, "doc_id", "text",
        m2, v2)
      .as[(Long, Int, String, Int)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("tokenizer artifact: malformed artifacts rejected") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_bad").toString
    // non-contiguous steps
    TextOps.saveTokenizer(spark, s"$dir/t1",
      merges.take(3).filterNot(_.step == 2),
      TextOps.bpeVocab(train, "text", merges.take(3)))
    intercept[IllegalArgumentException] {
      TextOps.loadTokenizer(spark, s"$dir/t1")
    }
  }

  test("partitioned token ids == expression-chain token ids (held-out sf0.001)") {
    val vocab = TextOps.bpeVocab(train, "text", merges)
    val key = (r: (Long, Int, String, Int)) => (r._1, r._2)
    val expr = TextOps.withBpeTokenIds(heldOut, "doc_id", "text", merges, vocab)
      .as[(Long, Int, String, Int)].collect().sortBy(key).toSeq
    val part = TextOps
      .withBpeTokenIdsPartitioned(heldOut, "doc_id", "text", merges, vocab)
      .as[(Long, Int, String, Int)].collect().sortBy(key).toSeq
    assert(part == expr)
    assert(expr.nonEmpty)
  }

  test("greedy word merge handles overlap/edge shapes like the replace chain") {
    val tricky = Seq(
      (0L, "aaa aaaa ab"),          // overlapping self-pairs
      (1L, "  spaced   out  "),     // whitespace collapse + trim
      (2L, ""),                     // empty text
      (3L, "x"),                    // single char
      (4L, "MIXED Case\tTabs\nNewlines")).toDF("doc_id", "text")
    val m = TextOps.trainBpe(Seq((0L, "aaa aaaa ab ab")).toDF("doc_id", "text"),
      "text", numMerges = 4)
    val key = (r: (Long, Long, String)) => r._1
    val expr = TextOps.withBpeSegmentation(tricky, "text", m, "seg", "n")
      .select("doc_id", "n", "seg")
      .as[(Long, Long, String)].collect().sortBy(key).toSeq
    val part = TextOps.withBpeSegmentationPartitioned(tricky, "text", m, "seg", "n")
      .select("doc_id", "n", "seg")
      .as[(Long, Long, String)].collect().sortBy(key).toSeq
    assert(part == expr)
  }

  test("batched training == sequential training on sf0.001 (the q88 gate shape)") {
    assert(TextOps.trainBpeBatched(train, "text", numMerges = 12) == merges)
  }

  test("batched training == sequential at every batch size, ties included") {
    // equal-count pairs force the tie-break path; shared tokens force
    // early batch cut-offs
    val df = Seq((0L, "low low lower newest newest wide west ab ab cd cd"),
      (1L, "aaa abab")).toDF("doc_id", "text")
    val seq = TextOps.trainBpe(df, "text", numMerges = 15)
    for (mb <- Seq(1, 2, 4, 32)) {
      val bat = TextOps.trainBpeBatched(df, "text", numMerges = 15,
        maxBatch = mb)
      assert(bat == seq, s"maxBatch=$mb diverged")
    }
  }

  test("batched training respects a small candidate pool (floor guard)") {
    val df = Seq((0L, "low low lower newest newest wide west ab ab cd cd"))
      .toDF("doc_id", "text")
    val seq = TextOps.trainBpe(df, "text", numMerges = 10)
    assert(TextOps.trainBpeBatched(df, "text", numMerges = 10,
      maxBatch = 4, candidatePool = 4) == seq)
  }
}
