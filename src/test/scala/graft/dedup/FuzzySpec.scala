package graft.dedup

import graft.SparkSpec

/** Fuzzy.fuzzyJoinAgainst — dual-pass blocking recall, band
  * straddling, verify threshold, dedupe of double-matched pairs.
  * q114 pins the corpus-scale join against DuckDB. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def join(a: Seq[(Long, String)], b: Seq[(Long, String)],
                   maxDist: Int): Seq[(Long, Long, Long)] =
    Fuzzy.fuzzyJoinAgainst(a.toDF("id_a", "s"), b.toDF("id_b", "s"),
        "id_a", "s", "id_b", "s", maxDist)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("prefix typo caught by the suffix pass and vice versa") {
    val a = Seq((1L, "golden widget"), (2L, "copper spring"))
    val b = Seq(
      (10L, "zolden widget"),   // first char swapped → suffix pass
      (11L, "copper sprinq"))   // last char swapped → prefix pass
    assert(join(a, b, maxDist = 1) ==
      Seq((1L, 10L, 1L), (2L, 11L, 1L)))
  }

  test("identical strings match at distance 0, once") {
    // both passes generate the pair; output must carry it once
    val out = join(Seq((1L, "alpha beta")), Seq((9L, "alpha beta")), 2)
    assert(out == Seq((1L, 9L, 0L)))
  }

  test("beyond maxDist is excluded even when blocks collide") {
    // same prefix and suffix, 3 edits apart
    val out = join(Seq((1L, "abxyzcd")), Seq((9L, "abuvwcd")), 2)
    assert(out == Seq.empty)
  }

  test("length-band straddle: deletions up to maxDist still match") {
    // len 12 vs len 10: bands 4 vs 3 — only the probe-side fan-out
    // of adjacent bands can generate this pair
    val out = join(Seq((1L, "golden widge")), Seq((9L, "golden wid")), 2)
    assert(out == Seq((1L, 9L, 2L)))
  }

  test("normalization: case and outer whitespace are ignored") {
    val out = join(Seq((1L, "  Golden Widget ")),
      Seq((9L, "golden widget")), 0)
    assert(out == Seq((1L, 9L, 0L)))
  }
}
