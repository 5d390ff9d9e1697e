package graft.functions

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** TextOps.repetitionStats against hand-computed Gopher-style metrics.
  * The q79 gate pins the same semantics against the DuckDB oracle at
  * sf0.01/sf0.1; this spec pins the definitional edge cases (overlap
  * overcount, short docs, empty docs, case/whitespace normalization).
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: (Long, String)*): Map[Long, (Double, Double)] =
    TextOps.repetitionStats(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

  test("top2_frac: most repetition-heavy 2-gram char coverage") {
    // words [aa bb aa bb aa], total 10 chars; "aa bb" x2 and "bb aa" x2
    // both cover 2*4=8 chars -> 0.8; only one 5-gram (count 1) -> dup5 0
    assert(stats(0L -> "aa bb aa bb aa")(0L) == (0.8, 0.0))
  }

  test("max is over count*chars, not count (tie-free determinism)") {
    // "cc dd" x1 (4 chars) vs "a b" x2 (2 chars each occurrence):
    // count-major would pick "a b" (2*2=4); char-weighted max compares
    // products: max(4, 4, ...) -- equal products, same value either way;
    // add "ee ff" x1 (4 chars): products still tie at 4 -> 4/12
    val (top2, _) = stats(1L -> "a b a b cc dd")(1L)
    assert(math.abs(top2 - 4.0 / 8.0) < 1e-12)
  }

  test("dup5_frac: overlapping duplicates overcount past 1.0") {
    // 15 words, every 5-gram duplicated: (3+2+2+2+2)*5 / 15 chars
    val (top2, dup5) = stats(2L -> "a b c d e a b c d e a b c d e")(2L)
    assert(math.abs(top2 - 0.4) < 1e-12)
    assert(math.abs(dup5 - 55.0 / 15.0) < 1e-12)
  }

  test("short, empty, and whitespace-only docs yield 0.0 rows") {
    val m = stats(3L -> "hi", 4L -> "", 5L -> "   ", 6L -> "one two three four")
    assert(m(3L) == (0.0, 0.0)) // no 2-gram
    assert(m(4L) == (0.0, 0.0))
    assert(m(5L) == (0.0, 0.0))
    // 2-grams "one two"(6) "two three"(8) "three four"(9) all x1 ->
    // max product 9 over total 15 chars
    assert(m(6L) == (9.0 / 15.0, 0.0))
  }

  test("normalization: case-insensitive, whitespace collapsed") {
    // words [foo foo foo foo bar], total 15; overlapping "foo foo" x3
    // -> 3*6/15 (top2 can exceed 1.0 for degenerate repetition too)
    assert(stats(7L -> "Foo  FOO\tfoo\nFoo bar")(7L)._1 == 18.0 / 15.0)
  }

  test("one-pass scan expression ≡ aggregate twin, bitwise") {
    // the r20 PolicySignals path vs the pre-r20 explode+shuffle form:
    // same doubles bit-for-bit on normalization edges, repetition
    // degeneracy, short/empty docs, non-BMP text (length = code
    // points), leading non-space whitespace (trim is 0x20-only), and
    // null text (aggregate's explode_outer default 0.0 ≡ the scan
    // path's coalesce)
    val rows = Seq[(java.lang.Long, String)](
      (0L, "aa bb aa bb aa"), (1L, "a b a b cc dd"),
      (2L, "a b c d e a b c d e a b c d e"), (3L, "hi"), (4L, ""),
      (5L, "   "), (6L, "one two three four"),
      (7L, "Foo  FOO\tfoo\nFoo bar"),
      (8L, "\t\nthe quick éé 😀😀 " +
        "😀😀 the quick éé brown fox"),
      (9L, null),
      (10L, "x y z x y z x y z x y z w w w w w q"))
      .toDF("doc_id", "text")
    val fast = TextOps.repetitionStats(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val agg = TextOps.repetitionStatsAgg(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(fast == agg)
    assert(fast.size == 11)
  }
}
