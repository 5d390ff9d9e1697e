package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Every Gopher-policy signal in ONE scan pass (r20) — the
  * [[graft.text.FilterPolicy]] hot path without the second corpus scan,
  * the (doc, gram) explode and its two exchanges.
  *
  * The composed-expression form tokenizes the document once per derived
  * column (project collapsing re-inlines the split into `_nt`, `_alpha`,
  * `_nstop` and both gram arrays — HOFs take no codegen CSE), and the
  * repetition metrics either pay a corpus-wide explode + two shuffles
  * (`TextOps.repetitionStats`) or an O(grams²) per-row HOF scan
  * (`TextOps.withRepetitionCols`). This expression tokenizes ONCE and
  * counts grams through a hash map — O(grams) per row, zero shuffle.
  *
  * Value contract (bit-exact with both existing paths, pinned by
  * `RepetitionSpec`/`StreamingPolicySpec`/`FilterPolicySpec`):
  *  - tokenization replicates `split(trim(lower(text)), "\\s+")` with
  *    empty tokens dropped — [[UTF8String.toLowerCase]] +
  *    [[UTF8String.trim]] (0x20 only) + Java regex split limit −1, the
  *    [[TextProbe]] recipe;
  *  - `length(w)` is code-point count (what Spark's `length` computes);
  *  - `chars(gram)` = gram code points minus its (n−1) single-space
  *    joiners ≡ `length(regexp_replace(gram, " ", ""))` — split tokens
  *    contain no whitespace;
  *  - `top2` = max over distinct 2-grams of cnt×chars, `dup5` = sum
  *    over distinct 5-grams with cnt>1 of cnt×chars — integer longs;
  *  - fractions = long→double casts divided exactly like the SQL
  *    `cast(x as double) / total`, 0.0 when the document has no
  *    non-empty tokens (`_rtotal > 0` guard ≡ `alpha > 0`);
  *  - null text → null struct (size/aggregate over a null array), the
  *    callers re-establish the 0.0-fraction default with `coalesce`
  *    exactly where the join/otherwise paths did.
  */
object PolicySignalsOps {

  /** (n_tokens, alpha, n_stop, top2_frac, dup5_frac) for one document;
    * null for null text. */
  def compute(text: UTF8String, stop: java.util.Set[String]): InternalRow = {
    if (text == null) return null
    val t = text.toLowerCase.trim.toString
    val raw = t.split("\\s+", -1)
    var n = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) n += 1; i += 1 }
    val ws = new Array[String](n)
    val chars = new Array[Long](n)
    var alpha = 0L
    var nstop = 0L
    var k = 0
    i = 0
    while (i < raw.length) {
      val w = raw(i)
      if (!w.isEmpty) {
        val c = w.codePointCount(0, w.length).toLong
        ws(k) = w
        chars(k) = c
        alpha += c
        if (stop.contains(w)) nstop += 1
        k += 1
      }
      i += 1
    }
    val top2 = maxGramProduct(ws, chars, 2)
    val dup5 = dupGramSum(ws, chars, 5)
    val t2f = if (alpha > 0) top2.toDouble / alpha.toDouble else 0.0
    val d5f = if (alpha > 0) dup5.toDouble / alpha.toDouble else 0.0
    new GenericInternalRow(Array[Any](n.toLong, alpha, nstop, t2f, d5f))
  }

  /** cnt/chars per distinct word n-gram, one linear hash-map pass. */
  private def gramCounts(ws: Array[String], chars: Array[Long],
                         n: Int): java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder(ws(i))
      var cs = chars(i)
      var j = 1
      while (j < n) { sb.append(' ').append(ws(i + j)); cs += chars(i + j); j += 1 }
      val g = sb.toString
      val e = m.get(g)
      if (e == null) m.put(g, Array(1L, cs)) else e(0) += 1L
      i += 1
    }
    m
  }

  /** max over distinct n-grams of cnt×chars; 0 when no n-gram exists
    * (the `coalesce(array_max(...), 0)` default). */
  private def maxGramProduct(ws: Array[String], chars: Array[Long],
                             n: Int): Long = {
    if (ws.length < n) return 0L
    var best = 0L
    val it = gramCounts(ws, chars, n).values().iterator()
    while (it.hasNext) {
      val e = it.next()
      val p = e(0) * e(1)
      if (p > best) best = p
    }
    best
  }

  /** sum over distinct n-grams with cnt>1 of cnt×chars; 0 when none. */
  private def dupGramSum(ws: Array[String], chars: Array[Long],
                         n: Int): Long = {
    if (ws.length < n) return 0L
    var s = 0L
    val it = gramCounts(ws, chars, n).values().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e(0) > 1L) s += e(0) * e(1)
    }
    s
  }
}

/** `struct<n_tokens,alpha,n_stop:bigint, top2_frac,dup5_frac:double>`
  * of Gopher-policy signals for a text column; null for null text.
  * The stopword set rides as a reference object. */
case class PolicySignals(text: Expression,
                         stopwords: java.util.HashSet[String])
  extends UnaryExpression {

  override def child: Expression = text
  override def nullable: Boolean = true
  override def prettyName: String = "graft_policy_signals"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    text.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string column, got ${other.simpleString}")
    }

  // plan/UI rendering: never inline the set contents (the TextProbe
  // stringArgs discipline; cosmetic here — 10 stopwords)
  override def stringArgs: Iterator[Any] =
    Iterator(text, s"stopwords[${stopwords.size}]")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("top2_frac", DoubleType, nullable = false),
    StructField("dup5_frac", DoubleType, nullable = false)))

  override def eval(input: InternalRow): Any =
    PolicySignalsOps.compute(
      text.eval(input).asInstanceOf[UTF8String], stopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = text.genCode(ctx)
    val s = ctx.addReferenceObj("stopwords", stopwords, "java.util.Set")
    ev.copy(code = code"""
      ${t.code}
      InternalRow ${ev.value} = graft.functions.PolicySignalsOps.compute(
        ${t.isNull} ? null : ${t.value}, $s);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PolicySignals = copy(text = newChild)
}
