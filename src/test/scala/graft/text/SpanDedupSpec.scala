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

  test("interval scrub == exploded-rebuild twin on the real corpus") {
    // the r20 scrub tail (per-doc merged cover intervals, text never
    // pos-exploded) against the pre-r20 exploded anti-join + sort
    // aggregate — row-for-row including disappearing fully-covered
    // docs, null-text drops, empty-token docs and multi-span merges
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text")
    val edge = Seq((900001L, ""), (900002L, "   "),
      (900003L, null.asInstanceOf[String]),
      (900004L, "a b c d e f a b c d e f gap1 gap2 gap3 gap4 gap5 " +
        "gap6 gap7 a b c d e f"),
      (900005L, "a b c d e f a b c d e f gap a b c d e f"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(edge)
    val fast = SpanDedup.removeDuplicatedSpans(all, "doc_id", "text", 4)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val slow = SpanDedup.removeDuplicatedSpansExploded(all, "doc_id",
        "text", 4)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(fast == slow)
    assert(fast.nonEmpty)
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

  // ---- the incremental COUNT artifact + multiplicity-exact scrub ----

  test("gramDocCounts counts DISTINCT docs per n-gram hash") {
    val corpus = Seq(
      (1L, "a b c d"),       // grams: "a b c", "b c d"
      (2L, "a b c e"),       // grams: "a b c", "b c e"
      (3L, "a b c a b c"))   // "a b c" twice (+ bridge grams) — still ONE doc
      .toDF("doc_id", "text")
    val counts = SpanDedup.gramDocCounts(corpus, "doc_id", "text", n = 3)
      .as[(String, Long)].collect().toMap
    // the shared gram's hash: md5 of the space-joined lowercase words
    val h = spark.sql("SELECT md5('a b c')").as[String].head()
    assert(counts(h) == 3L, "within-doc repetition must not inflate nd")
    assert(counts.filter(_._2 > 1) == Map(h -> 3L),
      s"only 'a b c' crosses docs: $counts")
  }

  private def scrubWithCounts(batch: Seq[(Long, String)],
                              corpus: Seq[(Long, String)],
                              n: Int, minDocs: Int) = {
    val counts = SpanDedup.gramDocCounts(
      corpus.toDF("doc_id", "text"), "doc_id", "text", n)
    SpanDedup.removeDuplicatedSpansWithCounts(
        batch.toDF("doc_id", "text"), counts, "doc_id", "text", n, minDocs)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
  }

  test("counts-scrub: batch-only grams cross the threshold alone") {
    // corpus shares nothing; two batch docs share "a b c d"
    val corpus = Seq((100L, "x y z w"))
    val batch = Seq(
      (1L, "a b c d p"),
      (2L, "q a b c d"),
      (3L, "u v w s t"))
    assert(scrubWithCounts(batch, corpus, n = 3, minDocs = 2) == Seq(
      (1L, "p", 1L), (2L, "q", 1L), (3L, "u v w s t", 5L)))
  }

  test("counts-scrub: batch + corpus multiplicities SUM toward minDocs") {
    // "a b c d" in ONE batch doc + TWO corpus docs: 1+2 >= 3 scrubs at
    // minDocs=3; "e f g h" in one batch doc + ONE corpus doc: 1+1 < 3
    // survives at minDocs=3 but scrubs at minDocs=2 (the against-form
    // special case)
    val corpus = Seq((100L, "a b c d x"), (101L, "y a b c d"),
      (102L, "e f g h z"))
    val batch = Seq(
      (1L, "k a b c d m"),
      (2L, "k e f g h m"))
    assert(scrubWithCounts(batch, corpus, n = 3, minDocs = 3) == Seq(
      (1L, "k m", 2L), (2L, "k e f g h m", 6L)))
    assert(scrubWithCounts(batch, corpus, n = 3, minDocs = 2) == Seq(
      (1L, "k m", 2L), (2L, "k m", 2L)))
  }

  test("counts-scrub parity: == removeDuplicatedSpans over the union, " +
      "restricted to batch ids (disjoint id spaces)") {
    // mixed crossings: batch-internal (1,3 share "p q r s"), cross-side
    // (5 shares "a b c d" with corpus 100), corpus-internal only (100,
    // 101 share "m n o" — must NOT scrub any batch doc at minDocs=3
    // unless a batch doc carries it too: doc 7 does), untouched (9)
    val corpus = Seq(
      (100L, "a b c d m n o"),
      (101L, "m n o t u v w"),
      (102L, "z1 z2 z3 z4"))
    val batch = Seq(
      (1L, "p q r s e1 e2"),
      (3L, "e3 p q r s e4"),
      (5L, "e5 a b c d e6"),
      (7L, "e7 m n o e8 e9"),
      (9L, "w1 w2 w3 w4 w5"))
    for (minDocs <- Seq(2, 3)) {
      val batchIds = batch.map(_._1).toSet
      val full = SpanDedup.removeDuplicatedSpans(
          (batch ++ corpus).toDF("doc_id", "text"),
          "doc_id", "text", n = 3, minDocs = minDocs)
        .as[(Long, String, Long)].collect()
        .filter(r => batchIds(r._1)).sortBy(_._1).toSeq
      val inc = scrubWithCounts(batch, corpus, n = 3, minDocs = minDocs)
      assert(inc == full, s"minDocs=$minDocs: incremental $inc != full-run " +
        s"batch slice $full")
    }
  }

  test("counts-scrub pins the documented overlap-id DOUBLE COUNT: an id " +
      "in both batch and corpus over-scrubs vs the true-union replay") {
    // doc 1 appears (same text) in batch AND in the corpus the counts
    // were built over: _bnd=1 + nd=1 = 2 >= minDocs=2 scrubs everything,
    // where a replay over the DEDUPED union (one distinct doc) keeps it
    val text = "a b c d e"
    val inc = scrubWithCounts(Seq((1L, text)), Seq((1L, text)),
      n = 3, minDocs = 2)
    assert(inc.isEmpty, "overlapping id must over-scrub (documented)")
    val replay = SpanDedup.removeDuplicatedSpans(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 3, 2)
      .as[(Long, String, Long)].collect().toSeq
    assert(replay == Seq((1L, text, 5L)), "the true union keeps the doc")
  }

  test("counts-scrub rejects a frame that is not a gramDocCounts artifact") {
    val batch = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bad = Seq(("x", 1L)).toDF("hash", "n")
    val e = intercept[IllegalArgumentException] {
      SpanDedup.removeDuplicatedSpansWithCounts(batch, bad,
        "doc_id", "text", 3, 2)
    }
    assert(e.getMessage.contains("gramDocCounts"))
  }
}
