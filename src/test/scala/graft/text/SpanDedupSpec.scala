package graft.text

import graft.SparkSpec

/** SpanDedup.duplicatedSpans — hand-computed maximal spans: overlap
  * merge, adjacency merge, gap split, within-doc repeats NOT counted
  * as cross-doc, minDocs threshold. The q91 gate pins the same
  * computation against DuckDB at sf0.01/sf0.1. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], n: Int, minDocs: Int = 2) =
    SpanDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", n, minDocs)
      .as[(Long, Int, Int, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  test("a shared trigram run merges into one maximal span per doc") {
    // docs share "a b c d" -> dup 3-grams at doc positions: (a b c), (b c d)
    val docs = Seq(
      (1L, "a b c d x y z"),
      (2L, "q a b c d r s"))
    assert(spans(docs, n = 3) == Seq(
      (1L, 0, 3, 2L),   // covers a..d, two overlapping grams
      (2L, 1, 4, 2L)))
  }

  test("distinct duplicated regions split on the gap rule") {
    // shared block at the start AND at the end, unique middle wide
    // enough that coverage never touches
    val docs = Seq(
      (1L, "a b c m1 m2 m3 m4 m5 m6 x y z"),
      (2L, "a b c k1 k2 k3 k4 k5 k6 x y z"))
    assert(spans(docs, n = 3) == Seq(
      (1L, 0, 2, 1L), (1L, 9, 11, 1L),
      (2L, 0, 2, 1L), (2L, 9, 11, 1L)))
  }

  test("within-doc repetition alone is not a cross-doc duplicate") {
    // "p q r" repeats inside doc 1 but appears in no other doc
    val docs = Seq(
      (1L, "p q r u v p q r"),
      (2L, "entirely different words here"))
    assert(spans(docs, n = 3).isEmpty)
  }

  test("minDocs raises the duplication bar") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "a b c f"))
    // 3-gram "a b c" is in all three docs; minDocs=3 still keeps it,
    // minDocs=4 drops it (via the q91 default shape minDocs=2 too)
    assert(spans(docs, n = 3, minDocs = 3).map(_._1) == Seq(1L, 2L, 3L))
    assert(spans(docs, n = 3, minDocs = 4).isEmpty)
  }

  test("short docs (< n tokens) contribute nothing and do not crash") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, ""))
    assert(spans(docs, n = 3).isEmpty)
  }

  private def scrub(docs: Seq[(Long, String)], n: Int) =
    SpanDedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

  test("scrub removes covered tokens and rebuilds in position order") {
    val docs = Seq(
      (1L, "a b c d x y z"),
      (2L, "q a b c d r s"))
    assert(scrub(docs, n = 3) == Seq(
      (1L, "x y z", 3L),
      (2L, "q r s", 3L)))
  }

  test("fully-covered documents disappear from the scrubbed corpus") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "u v w x"))
    assert(scrub(docs, n = 3) == Seq((3L, "u v w x", 4L)))
  }

  test("A-vs-B spans hit corpus grams only — batch-internal dups don't count") {
    val corpus = Seq((0L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    // batch doc 1 shares "a b c d" with the corpus; docs 3 and 5 share
    // "p q r" with each other but with NO corpus doc — must not hit
    val batch = Seq(
      (1L, "k a b c d m"),
      (3L, "p q r s t u"),
      (5L, "p q r v w x")).toDF("doc_id", "text")
    val got = SpanDedup.duplicatedSpansAgainst(batch, corpus,
        "doc_id", "text", n = 3)
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 1, 4, 2L)))
  }

  test("A-vs-B scrub removes corpus-covered tokens only") {
    val corpus = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "k a b c d m"),   // middle covered -> "k m"
      (3L, "a b c d"),       // fully covered -> disappears
      (5L, "p q r s")).toDF("doc_id", "text") // untouched
    val got = SpanDedup.removeDuplicatedSpansAgainst(batch, corpus,
        "doc_id", "text", n = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "k m", 2L), (5L, "p q r s", 4L)))
  }
}
