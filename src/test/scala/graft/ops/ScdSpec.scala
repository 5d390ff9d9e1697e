package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scd.scd2Apply — all four per-key verdicts, delta vs full-snapshot
  * modes, closed-history passthrough. q113 pins the corpus-scale
  * apply against DuckDB. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  // (pk, name, city, valid_from, valid_to)
  private val current = Seq(
    (1L, "ann", "oslo", 0L, Some(50L)),   // closed history
    (1L, "ann", "bonn", 50L, None),       // open, will change
    (2L, "bob", "rome", 0L, None),        // open, unchanged in updates
    (3L, "cat", "kiev", 0L, None)         // open, missing from updates
  ).toDF("pk", "name", "city", "valid_from", "valid_to")
    .withColumn("valid_to", col("valid_to").cast("long"))

  private val updates = Seq(
    (1L, "ann", "lima"),                  // changed city
    (2L, "bob", "rome"),                  // identical
    (9L, "eve", "baku")                   // brand new
  ).toDF("pk", "name", "city")

  private def apply(closeMissing: Boolean) =
    Scd.scd2Apply(current, updates, "pk", Seq("name", "city"),
        batchTs = 100L, closeMissing = closeMissing)
      .as[(Long, String, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._4)).toSeq

  test("delta mode: change closes + reopens; missing key untouched") {
    assert(apply(closeMissing = false) == Seq(
      (1L, "ann", "oslo", 0L, Some(50L)),    // history passthrough
      (1L, "ann", "bonn", 50L, Some(100L)),  // closed at batch ts
      (1L, "ann", "lima", 100L, None),       // new version
      (2L, "bob", "rome", 0L, None),         // unchanged
      (3L, "cat", "kiev", 0L, None),         // delta mode: untouched
      (9L, "eve", "baku", 100L, None)))      // new key
  }

  test("full-snapshot mode: vanished keys are closed") {
    val out = apply(closeMissing = true)
    assert(out.contains((3L, "cat", "kiev", 0L, Some(100L))))
    assert(!out.contains((3L, "cat", "kiev", 0L, None)))
    assert(out.size == 6)
  }

  test("null payload values participate in change detection") {
    val cur = Seq((1L, Some("x"), 0L, None: Option[Long]))
      .toDF("pk", "v", "valid_from", "valid_to")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val upd = Seq((1L, None: Option[String])).toDF("pk", "v")
    val out = Scd.scd2Apply(cur, upd, "pk", Seq("v"), batchTs = 7L)
      .as[(Long, Option[String], Long, Option[Long])]
      .collect().sortBy(_._3).toSeq
    assert(out == Seq(
      (1L, Some("x"), 0L, Some(7L)),
      (1L, None, 7L, None)))
  }

  test("column-boundary shift IS a change (separator in fingerprint)") {
    // ("ab","c") vs ("a","bc"): an empty-separator fingerprint would
    // concat both to "abc" and silently drop the update.
    val cur = Seq((1L, "ab", "c", 0L, None: Option[Long]))
      .toDF("pk", "a", "b", "valid_from", "valid_to")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val upd = Seq((1L, "a", "bc")).toDF("pk", "a", "b")
    val out = Scd.scd2Apply(cur, upd, "pk", Seq("a", "b"), batchTs = 9L)
      .as[(Long, String, String, Long, Option[Long])]
      .collect().sortBy(_._4).toSeq
    assert(out == Seq(
      (1L, "ab", "c", 0L, Some(9L)),
      (1L, "a", "bc", 9L, None)))
  }

  test("NULL vs empty string IS a change (distinct null sentinel)") {
    val cur = Seq((1L, Some(""), 0L, None: Option[Long]))
      .toDF("pk", "v", "valid_from", "valid_to")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val upd = Seq((1L, None: Option[String])).toDF("pk", "v")
    val out = Scd.scd2Apply(cur, upd, "pk", Seq("v"), batchTs = 9L)
      .as[(Long, Option[String], Long, Option[Long])]
      .collect().sortBy(_._3).toSeq
    assert(out == Seq(
      (1L, Some(""), 0L, Some(9L)),
      (1L, None, 9L, None)))
  }

  test("empty updates leave the dimension untouched in delta mode") {
    val out = Scd.scd2Apply(current, updates.limit(0), "pk",
        Seq("name", "city"), batchTs = 100L)
      .as[(Long, String, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._4)).toSeq
    assert(out == current
      .as[(Long, String, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._4)).toSeq)
  }
}
