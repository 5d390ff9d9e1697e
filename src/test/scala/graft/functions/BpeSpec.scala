package graft.functions

import graft.SparkSpec
import graft.text.TextOps
import graft.text.TextOps.BpeMerge
import org.apache.spark.sql.functions._

/** TextOps.trainBpe / withBpeSegmentation against hand-verified merge
  * sequences (cross-checked with an independent imperative BPE
  * implementation during development). The q76/q77 gates pin the same
  * semantics against the unrolled DuckDB oracle at sf0.01/sf0.1; this
  * spec pins the edge cases a real corpus never exercises. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "low low low low low"),
    (1L, "lower lower"),
    (2L, "newest newest newest"),
    (3L, "wide west")).toDF("doc_id", "text")

  test("trainBpe learns the hand-computed merge sequence in order") {
    val m = TextOps.trainBpe(corpus, "text", numMerges = 8)
    assert(m == Seq(
      BpeMerge(1, "l", "o", "lo", 7),
      BpeMerge(2, "lo", "w", "low", 7),
      BpeMerge(3, "e", "s", "es", 4),
      BpeMerge(4, "es", "t", "est", 4),
      BpeMerge(5, "w", "est", "west", 4),
      BpeMerge(6, "e", "west", "ewest", 3),
      BpeMerge(7, "n", "ewest", "newest", 3),
      BpeMerge(8, "e", "r", "er", 2)))
  }

  test("merge application is greedy left-to-right on overlapping pairs") {
    // "aaa": pair (a,a) occurs at positions 1-2 AND 2-3 (count 2 per
    // word — overlaps COUNT), but applying the rule merges only the
    // leftmost occurrence per scan: aaa -> [aa, a], never [a, aa]
    val df = Seq((0L, "aaa aaa"), (1L, "ab")).toDF("doc_id", "text")
    val m = TextOps.trainBpe(df, "text", numMerges = 10)
    assert(m == Seq(
      BpeMerge(1, "a", "a", "aa", 4),
      BpeMerge(2, "aa", "a", "aaa", 2),
      BpeMerge(3, "a", "b", "ab", 1)))
  }

  test("equal counts break ties on (lhs, rhs) ascending") {
    val df = Seq((0L, "cd ab")).toDF("doc_id", "text")
    assert(TextOps.trainBpe(df, "text", numMerges = 1)
      == Seq(BpeMerge(1, "a", "b", "ab", 1)))
  }

  test("training stops early when no adjacent pair remains") {
    // single word fuses completely after 1 merge; asking for 5 must
    // return 1, not loop or throw
    val df = Seq((0L, "ab")).toDF("doc_id", "text")
    assert(TextOps.trainBpe(df, "text", numMerges = 5).size == 1)
    assert(TextOps.trainBpe(df, "text", numMerges = 0).isEmpty)
  }

  test("segmentation applies rules in training order with word bounds") {
    val m = TextOps.trainBpe(corpus, "text", numMerges = 8)
    // "lowest": l|o|w|e|s|t -> lo -> low -> es -> est; the (w, est)
    // rule must NOT fire (the w is already inside "low") and no token
    // may span the space boundary
    val out = TextOps.withBpeSegmentation(
        Seq((9L, "  Lowest   NEWEST low ")).toDF("doc_id", "text"),
        "text", m, "seg", "n")
      .select(col("seg"), col("n")).collect().head
    assert(out.getString(0) == "low|est| |newest| |low|")
    assert(out.getLong(1) == 4L)
  }

  test("segmentation with zero merges is per-character") {
    val out = TextOps.withBpeSegmentation(
        Seq((0L, "ab c")).toDF("doc_id", "text"), "text", Nil, "seg", "n")
      .select(col("seg"), col("n")).collect().head
    assert(out.getString(0) == "a|b| |c|")
    assert(out.getLong(1) == 3L)
  }

  test("vocabulary is sorted alphabet then merges in training order") {
    val m = TextOps.trainBpe(corpus, "text", numMerges = 8)
    val v = TextOps.bpeVocab(corpus, "text", m)
    // corpus chars: d,e,i,l,n,o,r,s,t,w -> ids 0..9; merges -> 10..17
    assert(v.take(10).map(_.token) ==
      Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    assert(v.take(10).map(_.id) == (0 to 9))
    assert(v.drop(10).map(e => (e.token, e.id)) == Seq(
      ("lo", 10), ("low", 11), ("es", 12), ("est", 13),
      ("west", 14), ("ewest", 15), ("newest", 16), ("er", 17)))
  }

  test("token-id encoding: positions, vocab ids, UNK = -1") {
    val m = TextOps.trainBpe(corpus, "text", numMerges = 8)
    val v = TextOps.bpeVocab(corpus, "text", m)
    val rows = TextOps.withBpeTokenIds(
        Seq((9L, "lowest newest low"), (10L, "low xyz"))
          .toDF("doc_id", "text"),
        "doc_id", "text", m, v)
      .orderBy(col("doc_id"), col("pos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(rows.toSeq == Seq(
      (9L, 0, "low", 11), (9L, 1, "est", 13),
      (9L, 2, "newest", 16), (9L, 3, "low", 11),
      // x/y/z never appear in the training corpus -> UNK sentinel
      (10L, 0, "low", 11), (10L, 1, "x", -1),
      (10L, 2, "y", -1), (10L, 3, "z", -1)))
  }

  test("encoding an empty or whitespace-only doc yields zero rows") {
    val m = TextOps.trainBpe(corpus, "text", numMerges = 2)
    val v = TextOps.bpeVocab(corpus, "text", m)
    val n = TextOps.withBpeTokenIds(
        Seq((0L, ""), (1L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text", m, v).count()
    assert(n == 0L)
  }
}
