package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Benchmark-gram membership counting as ONE reference-object scan
  * expression (r20) — the decontamination hot path without the
  * (doc, gram) explode.
  *
  * The probe-join construction explodes every document into its
  * distinct word n-grams, semi-joins them through the broadcast
  * benchmark set and re-aggregates per doc — one exchange of
  * (id, gram-hit) rows plus the explode's row blow-up. For a
  * contract-sized benchmark (the [[graft.ops.ProbeGuard]] probe tier —
  * eval sets are MBs by definition) the whole decision fits in a
  * per-row membership count against the collected gram set: zero
  * explode, zero exchange, the text never leaves its scan. Measured
  * at sf0.1: 6.10 s → 2.64 s for the q82 report shape.
  *
  * Tokenization replicates the engine path BIT-EXACTLY — unlike a
  * JVM-locale `String.toLowerCase`/`trim`:
  *  - lowercase via [[UTF8String.toLowerCase]] (what Spark's `lower`
  *    executes),
  *  - trim via [[UTF8String.trim]] (0x20 only — Java's `String.trim`
  *    also strips \n/\t and would diverge on documents with leading
  *    non-space whitespace),
  *  - split `"\\s+"` with limit -1 (Spark's 2-arg `split` keeps
  *    trailing empties; Java's default limit 0 drops them),
  *  - n-grams joined with single spaces over ALL tokens, counted
  *    DISTINCT per document ([[graft.text.TextOps.withShingles]]'s
  *    array_distinct).
  * `DecontaminateSpec` pins row-path ≡ probe-join on the real corpus;
  * the q82/q126/q128/q129 oracles hash the results at both SFs. */
object TextProbe {

  /** How many DISTINCT benchmark n-grams `text` contains; null text
    * counts 0 (the probe join's left-join coalesce). */
  def benchGramCount(text: UTF8String, grams: java.util.Set[String],
                     n: Int): Long = {
    if (text == null) return 0L
    val t = text.toLowerCase.trim.toString
    val ws = t.split("\\s+", -1)
    if (ws.length < n) return 0L
    val seen = new java.util.HashSet[String]()
    var cnt = 0L
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder(ws(i))
      var j = 1
      while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
      val g = sb.toString
      if (seen.add(g) && grams.contains(g)) cnt += 1
      i += 1
    }
    cnt
  }
}

/** `bigint` count of distinct benchmark n-grams in a text column —
  * the gram set rides as a reference object ([[TextProbe]]). Never
  * null: null text counts 0. */
case class BenchGramCount(text: Expression, grams: java.util.HashSet[String],
                          n: Int)
  extends UnaryExpression {

  require(n >= 1, s"BenchGramCount: n must be >= 1, got $n")

  override def child: Expression = text
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bench_gram_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    text.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  // plan/UI rendering: show the gram-set SIZE, never its contents — a
  // contract-sized benchmark (up to 2M grams) would otherwise inline
  // ~50 MB of strings into every treeString/explain/error rendering
  // (the reference-object mechanism keeps the plan TREE O(1); this
  // keeps the plan TEXT O(1) too)
  override def stringArgs: Iterator[Any] =
    Iterator(text, s"grams[${grams.size}]", n)

  override def eval(input: InternalRow): Any =
    TextProbe.benchGramCount(
      text.eval(input).asInstanceOf[UTF8String], grams, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = text.genCode(ctx)
    val g = ctx.addReferenceObj("grams", grams, "java.util.Set")
    ev.copy(
      code = code"""
        ${t.code}
        long ${ev.value} = graft.functions.TextProbe.benchGramCount(
          ${t.isNull} ? null : ${t.value}, $g, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BenchGramCount = copy(text = newChild)
}
