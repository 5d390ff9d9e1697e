package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM implementations of the text-hash hot path, shared by
  * the interpreted `eval` and the generated code of the expressions
  * below (a top-level Scala object emits static forwarders, so
  * generated Java calls `graft.functions.TextHashImpl.lshSig(...)`
  * directly).
  *
  * VALUE CONTRACT — these must stay bit-identical to the composed
  * Column forms they replace (the DuckDB oracle reproduces that
  * family):
  *   - tokens  == `split(trim(lower(text)), "\\s+")` (UTF8String
  *     toLowerCase + space-only trim + Java regex split with limit -1,
  *     exactly Spark's Lower/StringTrim/StringSplit chain — including
  *     the ""-token edges on leading non-space whitespace and empty
  *     input)
  *   - shingle hash == `conv(substring(md5(shingle),1,8),16,10)` =
  *     unsigned int of the first 4 digest bytes
  *   - band b value == unsigned int of digest bytes [4b, 4b+4) — the
  *     numeric image of the hex window `substring(md5hex, 1+8b, 8)`;
  *     min over shingles of the 8-hex-char string IS the min of the
  *     unsigned value (fixed-width lowercase hex is order-isomorphic)
  *   - simhash    == per-word md5-32 majority bit votes
  *     ([[graft.dedup.Dedup.simhash32]] semantics)
  */
object TextHashImpl {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `split(trim(lower(text)), "\\s+")` — see value contract above. */
  def tokens(text: UTF8String): Array[String] = {
    val lowered = text.toLowerCase.toString
    // Spark's trim() strips ASCII space (0x20) ONLY — other whitespace
    // survives into split, producing the same ""-token edge cases
    var st = 0
    var en = lowered.length
    while (st < en && lowered.charAt(st) == ' ') st += 1
    while (en > st && lowered.charAt(en - 1) == ' ') en -= 1
    lowered.substring(st, en).split("\\s+", -1)
  }

  private def first4(d: Array[Byte], off: Int): Long =
    (((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL))

  /** LSH signature in ONE pass over the document: distinct word
    * n-gram shingles → one md5 per shingle → (distinct 32-bit shingle
    * hashes, per-band minima). Equals the staged Column pipeline in
    * [[graft.dedup.Dedup.lshPlan]] value-for-value; bands are the
    * numeric form of the hex-window minima (null when no shingle). */
  def lshSig(text: UTF8String, n: Int, bands: Int): InternalRow = {
    val toks = tokens(text)
    val digest = md.get()
    // distinct shingles, first-occurrence order (== array_distinct)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val shSet = new java.util.LinkedHashSet[java.lang.Long]()
    val bandMin = new Array[Long](bands)
    java.util.Arrays.fill(bandMin, -1L) // -1 = unset (values are >= 0)
    val it = seen.iterator()
    while (it.hasNext) {
      digest.reset()
      val d = digest.digest(it.next().getBytes("UTF-8"))
      shSet.add(first4(d, 0))
      var b = 0
      while (b < bands) {
        val v = first4(d, 4 * b)
        if (bandMin(b) < 0 || v < bandMin(b)) bandMin(b) = v
        b += 1
      }
    }
    val sh = new Array[Any](shSet.size)
    val sit = shSet.iterator()
    var k = 0
    while (sit.hasNext) { sh(k) = sit.next().longValue(); k += 1 }
    val bs = new Array[Any](bands)
    var b = 0
    while (b < bands) { bs(b) = if (bandMin(b) < 0) null else bandMin(b); b += 1 }
    InternalRow(new GenericArrayData(sh), new GenericArrayData(bs))
  }

  /** Exact Jaccard similarity of two SORTED distinct long arrays by
    * linear merge — zero allocation, no per-element boxing. The staged
    * form (`size(array_intersect(a,b))` etc.) builds a boxed hash set
    * per PAIR; at LSH-verification scale (millions of candidate pairs
    * x ~100-element shingle sets) that interpreted constant dominates
    * the whole pipeline. Identical math: |A∩B| / |A∪B|, 0.0 when both
    * sides are empty. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = (n + m - inter).toDouble
    if (union > 0) inter / union else 0.0
  }

  /** Order-sensitive rolling polynomial word hash in one pass: base 31,
    * mod 1e9+7, md5-32 per word ([[graft.text.TextOps.rollingWordHash]]
    * semantics — `aggregate(transform(words, w => md5_32(w) % M), 0,
    * (acc, h) => (acc*31 + h) % M)` value-for-value; acc stays < M so
    * acc*31 + h < 3.3e10 never overflows a long). */
  def rollingHash(text: UTF8String): Long = {
    val toks = tokens(text)
    val digest = md.get()
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      digest.reset()
      val h = first4(digest.digest(toks(i).getBytes("UTF-8")), 0) % 1000000007L
      acc = (acc * 31 + h) % 1000000007L
      i += 1
    }
    acc
  }

  /** 32-bit SimHash in one pass: per-word md5-32 majority bit votes. */
  def simhash32(text: UTF8String): Long = simhashOf(tokens(text))

  private def simhashOf(toks: Array[String]): Long = {
    val digest = md.get()
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      digest.reset()
      val h = first4(digest.digest(toks(i).getBytes("UTF-8")), 0)
      var bit = 0
      while (bit < 32) {
        if ((h & (1L << bit)) != 0) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 32) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** `struct(sig, ntok)` in ONE pass — the streaming near-dup dedup
    * key. sig is bit-identical to [[simhash32]] (same token array,
    * same vote loop); ntok matches `TextOps.tokenCount` (0 when the
    * space-trimmed text is empty, else the split length). Fused so the
    * streaming hot path tokenizes each event once, not once for the
    * signature and again for the count. */
  def simhashTok(text: UTF8String): InternalRow = {
    val toks = tokens(text)
    val ntok = if (toks.length == 1 && toks(0).isEmpty) 0L else toks.length.toLong
    InternalRow(simhashOf(toks), ntok)
  }
}

/** `struct(sh: array<long>, bands: array<long>)` LSH signature of a
  * text column (see [[TextHashImpl.lshSig]]). Replaces a chain of
  * interpreted higher-order transforms (shingle build, per-shingle
  * md5-hex, conv, per-band substring minima) with one codegen'd call —
  * the chain was the dominant cost of LSH candidate generation, and
  * interpreted lambdas can never be whole-stage-compiled. */
case class LshSignature(child: Expression, n: Int, bands: Int)
  extends UnaryExpression {

  require(n >= 1 && bands >= 1 && bands <= 4,
    "graft_lsh_sig: 1 <= n, 1 <= bands <= 4 (one md5 digest feeds 4 windows)")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_sig expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("sh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(LongType, containsNull = true), nullable = false)))

  override def prettyName: String = "graft_lsh_sig"

  override def nullSafeEval(input: Any): Any =
    TextHashImpl.lshSig(input.asInstanceOf[UTF8String], n, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashImpl.lshSig($c, $n, $bands)")

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

/** 32-bit SimHash of a text column (see [[TextHashImpl.simhash32]]) —
  * one codegen'd pass instead of a staged word-hash array plus 32
  * interpreted per-bit aggregates. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_simhash32 expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash32"

  override def nullSafeEval(input: Any): Any =
    TextHashImpl.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `struct(sig: long, ntok: long)` — [[SimHash32]]'s signature fused
  * with the token count in one tokenize pass (see
  * [[TextHashImpl.simhashTok]]); the streaming near-dup dedup key. */
case class SimHashTok(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_tok expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("sig", LongType, nullable = false),
    StructField("ntok", LongType, nullable = false)))

  override def prettyName: String = "graft_simhash_tok"

  override def nullSafeEval(input: Any): Any =
    TextHashImpl.simhashTok(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.simhashTok($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashTok =
    copy(child = newChild)
}

/** Order-sensitive rolling word hash of a text column (see
  * [[TextHashImpl.rollingHash]]) — one codegen'd pass instead of an
  * interpreted transform + aggregate fold over the token array (the
  * same interpreted-HOF cost the LSH/SimHash expressions removed).
  * Null text yields null, exactly like the staged form (`aggregate`
  * over a null token array is null). */
case class RollingWordHash(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    TextHashImpl.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingWordHash =
    copy(child = newChild)
}

/** Exact Jaccard over two SORTED distinct `array<long>` columns (see
  * [[TextHashImpl.jaccardSorted]]) — the LSH verification hot
  * instruction. The staged `array_intersect`/`size` chain it replaces
  * allocates a boxed hash set per candidate pair and cannot be
  * whole-stage-compiled past its interpreted set build; this is one
  * allocation-free merge per pair. Callers sort each document's shingle
  * set ONCE (`sort_array` inside the cached signature frame), not per
  * pair. Inputs MUST be sorted — the merge silently undercounts
  * otherwise (the staged-vs-native spec cross-validates on the real
  * pipeline). NULL if either side is NULL, matching the banded join
  * that can never produce one. */
case class JaccardSorted(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard expects two array<bigint> columns, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHashImpl.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}
