package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4Clean — line keep predicate edges + document-level filters.
  * The q98 gate pins the full pass against DuckDB at sf0.01/sf0.1. */
class C4CleanSpec extends SparkSpec {
  import spark.implicits._

  private def keeps(line: String, minWords: Int = 5): Boolean =
    Seq(line).toDF("l")
      .select(C4Clean.lineKeep(col("l"), minWords)).as[Boolean]
      .collect().head

  test("line keep: terminal punctuation required (rtrim first)") {
    assert(keeps("five good words ending with period."))
    assert(keeps("five good words ending with bang!"))
    assert(keeps("a quoted sentence of enough words.\""))
    assert(keeps("trailing spaces after the terminal period.   "))
    assert(!keeps("five good words but no punctuation"))
    assert(!keeps("ends with a comma, not terminal,"))
  }

  test("line keep: minimum word count") {
    assert(!keeps("too short."))
    assert(keeps("one two three four five."))
    assert(!keeps("one two three four five.", minWords = 6))
  }

  test("line keep: code and boilerplate markers drop the line") {
    assert(!keeps("enough words but code { inside } here."))
    assert(!keeps("please enable JavaScript to view this page."))
    assert(!keeps("please enable javascript to view this page."))
  }

  test("document filter: minLines and lorem ipsum") {
    val df = Seq(
      (1L, "good first sentence with words.\ngood second sentence with words.\ngood third sentence with words."),
      (2L, "only one good sentence with words.\nshort.\nnope"),
      (3L, "good first sentence with words.\ngood second sentence with words.\nlorem ipsum dolor sit amet and words.")
    ).toDF("id", "text")
    val out = C4Clean.clean(df, "text")
      .select("id", "n_lines", "n_kept")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 3L)))
  }

  test("clean_text is trimmed kept lines joined by newline") {
    val df = Seq((1L,
      "  padded first sentence with enough words.  \nx.\nsecond fine sentence with enough words.\nthird fine sentence with enough words."))
      .toDF("id", "text")
    val out = C4Clean.clean(df, "text")
      .select("clean_text", "n_lines", "n_kept")
      .as[(String, Long, Long)].collect().head
    assert(out == (("padded first sentence with enough words.\n" +
      "second fine sentence with enough words.\n" +
      "third fine sentence with enough words."), 4L, 3L))
  }

  test("input columns are preserved") {
    val df = Seq((1L, "src", "good first sentence with words.\ngood second sentence with words.\ngood third sentence with words."))
      .toDF("id", "source", "text")
    assert(C4Clean.clean(df, "text").columns.toSeq ==
      Seq("id", "source", "text", "clean_text", "n_lines", "n_kept"))
  }

  test("bad words: exact token match only — no substring false positives") {
    val df = Seq(
      (1L, "a clean document here"),
      (2L, "visit the CASINO now"),        // case-insensitive hit
      (3L, "classic bypassing words"),      // 'ass' must NOT fire on substrings
      (4L, "casino casino pills")           // multiplicity counted
    ).toDF("id", "text")
    val bl = Seq("casino", "pills", "ass")
    val rep = C4Clean.withBadWordFlags(df, "text", bl)
      .select("id", "n_bad", "has_bad")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(rep == Seq((1L, 0L, false), (2L, 1L, true),
      (3L, 0L, false), (4L, 3L, true)))
    val kept = C4Clean.dropBadWordDocs(df, "text", bl)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }
}
