package graft.text

import graft.SparkSpec

/** FilterPolicy — first-failing-rule semantics per hand-built
  * documents, one per rule plus the pass case and the empty edge.
  * The q93 gate pins the composition against DuckDB at sf0.01/sf0.1. */
class FilterPolicySpec extends SparkSpec {
  import spark.implicits._

  private def decide(docs: Seq[(Long, String)]) =
    FilterPolicy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Boolean, String)].collect()
      .sortBy(_._1).toSeq

  private val passText =
    ("the quick brown fox jumps over a lazy dog and " +
      (0 until 26).map(i => f"word$i%02d").mkString(" "))

  test("passing doc keeps with reason ok") {
    val Seq((_, nt, ns, keep, reason)) = decide(Seq((1L, passText)))
    assert(keep && reason == "ok")
    assert(nt == 36L && ns >= 2L)
  }

  test("too-short doc fails n_tokens first even when other rules also fail") {
    // 3 tokens, no stopwords, pure repetition — n_tokens wins the order
    val Seq((_, _, _, keep, reason)) = decide(Seq((1L, "zz zz zz")))
    assert(!keep && reason == "n_tokens")
  }

  test("short mean word length fails word_len before stopwords") {
    // 30 single-char tokens: passes count, mean len 1 < 3, 0 stopwords
    val text = Seq.fill(30)("z").mkString(" ")
    val Seq((_, nt, ns, keep, reason)) = decide(Seq((1L, text)))
    assert(nt == 30L && ns == 0L)
    assert(!keep && reason == "word_len")
  }

  test("missing stopwords fails stopwords before repetition") {
    // 30 distinct-ish 4-char words, no stopword, low repetition
    val text = (0 until 30).map(i => f"w$i%03d").mkString(" ")
    val Seq((_, _, ns, keep, reason)) = decide(Seq((1L, text)))
    assert(ns == 0L)
    assert(!keep && reason == "stopwords")
  }

  test("repetitive doc with sane shape fails repetition last") {
    // passes count/word-len/stopwords but one dominant 2-gram
    val text = ("the fox " * 20).trim
    val Seq((_, _, _, keep, reason)) = decide(Seq((1L, text)))
    assert(!keep && reason == "repetition")
  }

  test("empty doc fails n_tokens (no NaN leak from the mean)") {
    val Seq((_, nt, _, keep, reason)) = decide(Seq((1L, "")))
    assert(nt == 0L && !keep && reason == "n_tokens")
  }

  test("withVerdict == apply verdict-for-verdict and keeps input columns") {
    val docs = Seq(
      (1L, "s1", passText),
      (2L, "s1", "zz zz zz"),
      (3L, "s2", Seq.fill(30)("z").mkString(" ")),
      (4L, "s2", (0 until 30).map(i => f"w$i%03d").mkString(" ")),
      (5L, "s3", ("the fox " * 20).trim),
      (6L, "s3", ""),
      (7L, "s4", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val viaApply = FilterPolicy(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val inRow = FilterPolicy.withVerdict(docs, "text")
    assert(inRow.columns.toSeq ==
      Seq("doc_id", "source", "text", "reason", "n_tokens", "n_stop", "keep"))
    val viaRow = inRow
      .select("doc_id", "n_tokens", "n_stop", "keep", "reason")
      .orderBy("doc_id").collect().toSeq
    assert(viaRow == viaApply)
    // the join-free gate keeps exactly the rows the semi-join kept
    val keptRows = inRow.filter($"keep")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val semiRows = docs.join(
        FilterPolicy(docs, "doc_id", "text").filter($"keep")
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(keptRows == semiRows)
  }

  test("withVerdict rejects colliding input columns") {
    val df = Seq((1L, "x", true)).toDF("id", "text", "keep")
    val e = intercept[IllegalArgumentException] {
      FilterPolicy.withVerdict(df, "text")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("policy artifact round-trips and reproduces tuned verdicts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("policy").toString
    // loosened for short docs: token floor down, repetition caps up
    // (a 10-token doc's top bigram alone is >20% of its characters)
    val tuned = PolicyConfig.Gopher.copy(minTokens = 5, minStopwords = 1,
      maxTop2Frac = 0.9, maxDup5Frac = 0.9)
    FilterPolicy.savePolicy(spark, tuned, s"$dir/policy")
    val loaded = FilterPolicy.loadPolicy(spark, s"$dir/policy")
    assert(loaded == tuned)
    // a doc the default policy drops (n_tokens) but the tuned one keeps
    val doc = Seq((1L, "the quick brown fox jumps over a lazy dog runs"))
      .toDF("id", "text")
    def verdict(cfg: PolicyConfig) =
      FilterPolicy(doc, "id", "text", cfg)
        .select("keep").as[Boolean].head()
    assert(!verdict(PolicyConfig.Gopher))
    assert(verdict(loaded))
  }

  test("loadPolicy rejects non-artifact inputs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("policy").toString
    Seq((1, 2)).toDF("a", "b").write.parquet(s"$dir/bad")
    val e = intercept[IllegalArgumentException] {
      FilterPolicy.loadPolicy(spark, s"$dir/bad")
    }
    assert(e.getMessage.contains("not a policy artifact"))
  }
}
