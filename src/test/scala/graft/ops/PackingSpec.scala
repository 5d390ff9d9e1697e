package graft.ops

import graft.SparkSpec

/** Packing.packSequences — hand-computed manifests incl. boundary
  * exactness, doc-spanning sequences, multi-group independence,
  * repartition invariance. The q84 gate pins the manifest against the
  * DuckDB window+generate_series oracle at sf0.01/sf0.1. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def manifest(rows: Seq[(String, Long, Long)], L: Int) =
    Packing.packSequences(
        rows.toDF("g", "id", "n"), "id", "g", "n", L)
      .as[(String, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq

  test("single doc smaller than seqLen fills one short sequence") {
    assert(manifest(Seq(("a", 1L, 5L)), 8) == Seq(("a", 0L, 1L, 0L, 5L)))
  }

  test("docs pack densely; a doc spans a sequence boundary") {
    // stream: doc1 tokens 0-5, doc2 6-13 -> seq0 = doc1[0..5]+doc2[0..1],
    // seq1 = doc2[2..7]
    assert(manifest(Seq(("a", 1L, 6L), ("a", 2L, 8L)), 8) == Seq(
      ("a", 0L, 1L, 0L, 6L),
      ("a", 0L, 2L, 0L, 2L),
      ("a", 1L, 2L, 2L, 6L)))
  }

  test("a doc larger than seqLen spans several sequences") {
    // doc of 20 at L=8: seq0 [0..7], seq1 [8..15], seq2 [16..19]
    assert(manifest(Seq(("a", 1L, 20L)), 8) == Seq(
      ("a", 0L, 1L, 0L, 8L),
      ("a", 1L, 1L, 8L, 8L),
      ("a", 2L, 1L, 16L, 4L)))
  }

  test("exact boundary: doc ends exactly at a sequence edge") {
    // doc1 = 8 fills seq0 exactly; doc2 starts seq1 at offset 0
    assert(manifest(Seq(("a", 1L, 8L), ("a", 2L, 3L)), 8) == Seq(
      ("a", 0L, 1L, 0L, 8L),
      ("a", 1L, 2L, 0L, 3L)))
  }

  test("zero-token docs contribute nothing; groups pack independently") {
    val m = manifest(Seq(
      ("a", 1L, 0L), ("a", 2L, 4L), ("b", 1L, 4L), ("b", 2L, 6L)), 8)
    assert(m == Seq(
      ("a", 0L, 2L, 0L, 4L),
      ("b", 0L, 1L, 0L, 4L),
      ("b", 0L, 2L, 0L, 4L),
      ("b", 1L, 2L, 4L, 2L)))
  }

  test("per-sequence totals are seqLen except each group's last") {
    val rows = (1L to 37L).map(i => ("g", i, (i % 7) + 1))
    val m = manifest(rows, 16)
    val bySeq = m.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    val last = bySeq.keys.max
    bySeq.foreach { case (seq, tot) =>
      if (seq == last) assert(tot <= 16) else assert(tot == 16L)
    }
    // total tokens conserved
    assert(m.map(_._5).sum == rows.map(_._3).sum)
  }

  test("manifest is repartition-invariant") {
    val rows = (1L to 50L).map(i => (s"g${i % 3}", i, (i % 5) + 1))
    val a = manifest(rows, 8)
    val b = Packing.packSequences(
        rows.toDF("g", "id", "n").repartition(11), "id", "g", "n", 8)
      .as[(String, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(a == b)
  }

  test("invalid seqLen rejected") {
    intercept[IllegalArgumentException] {
      Packing.packSequences(Seq(("a", 1L, 2L)).toDF("g", "id", "n"),
        "id", "g", "n", 0)
    }
  }
}
