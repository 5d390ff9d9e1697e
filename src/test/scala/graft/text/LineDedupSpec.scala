package graft.text

import graft.SparkSpec

/** LineDedup — keep-first winner selection, minDocs threshold,
  * within-doc repeats, vanish-on-empty. q103 pins the corpus pass
  * against DuckDB at sf0.01/sf0.1. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("duplicated line survives only at its (id, pos)-first occurrence") {
    val df = Seq(
      (1L, "unique one\nfooter text\nunique two"),
      (2L, "footer text\nother content"),
      (3L, "more stuff\nfooter text")).toDF("id", "text")
    val out = LineDedup.removeDuplicatedLines(df, "id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "unique one\nfooter text\nunique two", 3L),
      (2L, "other content", 1L),
      (3L, "more stuff", 1L)))
  }

  test("within-document repeats are kept (cross-doc signal only)") {
    val df = Seq(
      (1L, "echo\necho\necho"),
      (2L, "something else")).toDF("id", "text")
    val out = LineDedup.removeDuplicatedLines(df, "id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out.head == ((1L, "echo\necho\necho", 3L)))
  }

  test("minDocs threshold raises the duplication bar") {
    val df = Seq(
      (1L, "shared\na"), (2L, "shared\nb")).toDF("id", "text")
    val strict = LineDedup.removeDuplicatedLines(df, "id", "text",
        minDocs = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(strict == Seq((1L, "shared\na", 2L), (2L, "shared\nb", 2L)))
  }

  test("a document whose every line is someone else's duplicate vanishes") {
    val df = Seq(
      (1L, "alpha line\nbeta line"),
      (2L, "alpha line\nbeta line")).toDF("id", "text")
    val out = LineDedup.removeDuplicatedLines(df, "id", "text")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "alpha line\nbeta line", 2L)))
  }

  test("A-vs-B: corpus hits removed, batch-internal dups kept") {
    val corpus = Seq((1L, "footer text\ncorpus only")).toDF("id", "text")
    val batch = Seq(
      (10L, "fresh a\nfooter text\nfresh b"),
      (11L, "twice\ntwice\nother")).toDF("id", "text")
    val out = LineDedup.removeDuplicatedLinesAgainst(
        batch, corpus, "id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, "fresh a\nfresh b", 2L),
      (11L, "twice\ntwice\nother", 3L)))
  }

  test("A-vs-B: fully-covered batch docs disappear") {
    val corpus = Seq((1L, "a line\nb line")).toDF("id", "text")
    val batch = Seq((10L, "a line\nb line"), (11L, "a line\nnew one"))
      .toDF("id", "text")
    val out = LineDedup.removeDuplicatedLinesAgainst(
        batch, corpus, "id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((11L, "new one", 1L)))
  }

  test("lines compare trimmed; rebuild emits trimmed lines") {
    val df = Seq(
      (1L, "  padded  \nkeep me"),
      (2L, "padded\nalso here")).toDF("id", "text")
    val out = LineDedup.removeDuplicatedLines(df, "id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "padded\nkeep me", 2L),
      (2L, "also here", 1L)))
  }

  test("paragraph granularity: blank-line units dedup, lines inside stay") {
    // the shared footer PARAGRAPH (which itself contains a newline)
    // dedups as one unit; at line granularity its two lines would
    // dedup separately
    val footer = "all rights reserved\nsee terms for details"
    val df = Seq(
      (1L, s"first unique paragraph\n\n$footer"),
      (2L, s"second unique paragraph\n\n$footer")).toDF("id", "text")
    val out = LineDedup.removeDuplicatedParagraphs(df, "id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, s"first unique paragraph\n\n$footer", 2L),
      (2L, "second unique paragraph", 1L)))
  }

  test("A-vs-B at paragraph granularity removes corpus paragraphs") {
    val corpus = Seq((1L, "standing para one\n\nstanding para two"))
      .toDF("id", "text")
    val batch = Seq((10L, "fresh para\n\nstanding para two"))
      .toDF("id", "text")
    val out = LineDedup.removeDuplicatedLinesAgainst(batch, corpus,
        "id", "text", sep = "\n\n")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((10L, "fresh para", 1L)))
  }
}
