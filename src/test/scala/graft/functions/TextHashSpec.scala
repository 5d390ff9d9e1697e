package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, StringType}

/** The native text-hash expressions must be value-identical to the
  * interpreted Column chains they replaced (TextHashImpl's documented
  * value contract), INCLUDING the hostile edges the contract calls out:
  * empty input, space-only input, non-space whitespace surviving trim,
  * unicode case folding, and documents shorter than the n-gram. Codegen
  * fallback is disabled for the native side so a generated-code compile
  * error fails the suite instead of silently degrading to eval. */
class TextHashSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, ""),                       // split("", -1) == [""] edge
    (3L, "   "),                    // trim eats all ASCII spaces -> ""
    (4L, "\tTabbed Words\n"),  // non-space whitespace survives trim
    (5L, "ΣΊΣΥΦΟΣ İstanbul STRASSE"), // unicode lowercase mappings
    (6L, "two words"),              // fewer tokens than the 3-gram
    (7L, "repeat repeat repeat repeat repeat"), // duplicate shingles
    (8L, null.asInstanceOf[String]),
  ).toDF("doc_id", "text")

  /** Run f with whole-stage codegen required (no interpreted fallback). */
  private def codegenOnly[A](f: => A): A = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  /** The pre-native staged Column chain for the LSH signature — the
    * reference semantics (Dedup.lshPlan's old sig0), with the band hex
    * windows mapped to their numeric image so both sides compare as
    * longs (fixed-width lowercase hex min == unsigned numeric min). */
  private def stagedLshSig(df: DataFrame, n: Int, bands: Int): DataFrame = {
    val staged = graft.text.TextOps.withShingles(
      df.select(col("doc_id"), col("text")), "text", "_shs", n)
      .withColumn("_digests", transform(col("_shs"), s => md5(s)))
    staged.select(col("doc_id"),
      array_distinct(transform(col("_digests"),
        h => conv(substring(h, 1, 8), 16, 10).cast("long"))).as("sh"),
      array((0 until bands).map(b =>
        array_min(transform(col("_digests"),
          h => conv(substring(h, 1 + 8 * b, 8), 16, 10).cast("long")))): _*).as("bands"))
  }

  private def nativeLshSig(df: DataFrame, n: Int, bands: Int): DataFrame =
    df.select(col("doc_id"), bridge.column(
        LshSignature(bridge.expression(col("text")), n, bands)).as("_s"))
      .select(col("doc_id"), col("_s.sh").as("sh"), col("_s.bands").as("bands"))

  private def collectSigs(df: DataFrame): Map[Long, (Seq[Long], Seq[Option[Long]])] =
    df.collect().map { r =>
      r.getLong(0) -> (
        if (r.isNullAt(1)) null
        else (r.getSeq[Long](1),
          r.getSeq[Any](2).map(v => Option(v).map(_.asInstanceOf[Long]))))
    }.toMap

  test("LshSignature equals the staged Column chain on every non-null edge doc") {
    val nonNull = edge.filter(col("text").isNotNull)
    for (n <- Seq(1, 3); bands <- Seq(1, 4)) {
      val native = codegenOnly(collectSigs(nativeLshSig(nonNull, n, bands)))
      val staged = collectSigs(stagedLshSig(nonNull, n, bands))
      assert(native == staged, s"mismatch at n=$n bands=$bands")
    }
  }

  test("LshSignature: null text -> null struct; short doc -> empty sh + null bands") {
    // DOCUMENTED divergence: the staged `when` chain maps null text to
    // (sh=[], bands=[null..]) while the null-intolerant native form
    // yields a null struct — downstream both explode to zero non-null
    // band rows and the doc can never appear in a pair, so lshPlan's
    // results are identical; the null form is the more honest one.
    val m = codegenOnly(collectSigs(nativeLshSig(edge, 3, 4)))
    assert(m(8L) == null)
    assert(collectSigs(stagedLshSig(edge, 3, 4))(8L) ==
      ((Seq.empty[Long], Seq.fill(4)(None))))
    assert(m(6L) == ((Seq.empty[Long], Seq.fill(4)(None))))
    // empty string tokenizes to [""], so 1-grams DO produce one shingle
    val one = codegenOnly(collectSigs(nativeLshSig(edge, 1, 2)))
    assert(one(2L)._1.length == 1 && one(2L) == one(3L),
      "\"\" and \"   \" must share the single empty-token shingle")
  }

  test("SimHash32 equals the staged word-hash Column form on every edge doc") {
    val stagedCol = {
      val whashes = transform(graft.text.TextOps.words(lower(col("text"))),
        w => graft.text.TextOps.md5_32(w))
      graft.dedup.Dedup.simhashFromHashes(whashes)
    }
    val staged = edge.select(col("doc_id"), stagedCol.as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val native = codegenOnly(
      edge.select(col("doc_id"),
          bridge.column(SimHash32(bridge.expression(col("text")))).as("s"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap)
    // DELIBERATE divergence on null text: the staged aggregate's 0L seed
    // leaked through as a signature of 0; the native form returns null
    // (see Dedup.withSimhash32 scaladoc). Everything else must be equal.
    assert(staged(8L) == 0L && native(8L) == null)
    assert((native - 8L) == (staged - 8L))
  }

  test("SimHashTok: sig bit-equals SimHash32, ntok equals tokenCount, every edge doc") {
    val got = codegenOnly {
      edge.filter(col("text").isNotNull)
        .select(col("doc_id"),
          bridge.column(SimHashTok(bridge.expression(col("text")))).as("st"),
          bridge.column(SimHash32(bridge.expression(col("text")))).as("sig32"),
          graft.text.TextOps.tokenCount(col("text")).as("ntok"))
        .collect()
    }
    got.foreach { r =>
      val st = r.getStruct(1)
      assert(st.getLong(0) == r.getLong(2),
        s"doc ${r.getLong(0)}: fused sig must bit-equal SimHash32")
      assert(st.getLong(1) == r.getLong(3),
        s"doc ${r.getLong(0)}: fused ntok must equal TextOps.tokenCount")
    }
    assert(got.length == 7)
  }

  test("analysis rejects non-string input and out-of-range band counts") {
    intercept[Exception] {
      edge.select(bridge.column(
        LshSignature(bridge.expression(col("doc_id")), 3, 4))).collect()
    }
    intercept[IllegalArgumentException] {
      LshSignature(bridge.expression(lit("x")), 3, 5)
    }
    intercept[IllegalArgumentException] {
      LshSignature(bridge.expression(lit("x")), 0, 4)
    }
  }

  test("RollingWordHash equals the staged transform+aggregate fold on every edge doc") {
    val staged = edge.select(col("doc_id"),
        graft.text.TextOps.rollingWordHash(col("text")).as("rh"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val native = codegenOnly(
      edge.select(col("doc_id"),
          graft.text.TextOps.rollingWordHashNative(col("text")).as("rh"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap)
    // null text is null under BOTH forms here (aggregate over a null
    // token array is null; the native expression is null-intolerant) —
    // unlike SimHash32 there is no seed to leak, so full equality holds
    assert(staged(8L) == null && native(8L) == null)
    assert(native == staged)
  }

  test("JaccardSorted equals the staged array_intersect form, hostile edges included") {
    // sorted distinct long arrays, the shape lshPlan's sig frame carries:
    // identical, disjoint, partial overlap, empty-vs-empty, empty-vs-
    // nonempty, single element, null side
    val rows = Seq(
      (1L, Seq(1L, 5L, 9L), Seq(1L, 5L, 9L)),
      (2L, Seq(1L, 2L, 3L), Seq(7L, 8L, 9L)),
      (3L, Seq(1L, 3L, 5L, 7L), Seq(3L, 7L, 11L)),
      (4L, Seq.empty[Long], Seq.empty[Long]),
      (5L, Seq.empty[Long], Seq(2L, 4L)),
      (6L, Seq(42L), Seq(42L)),
      (7L, null.asInstanceOf[Seq[Long]], Seq(1L, 2L)),
    ).toDF("id", "a", "b")
    val native = codegenOnly {
      rows.select(col("id"), round(bridge.column(JaccardSorted(
          bridge.expression(col("a")), bridge.expression(col("b")))), 4).as("j"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    }
    val inter = size(array_intersect(col("a"), col("b"))).cast("double")
    val union = (size(col("a")) + size(col("b"))).cast("double") - inter
    val staged = rows.select(col("id"),
        round(when(union > 0, inter / union).otherwise(lit(0.0)), 4).as("j"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // rows 1-6 agree value-for-value; row 7 is the DOCUMENTED divergence
    // (null-intolerant native vs the staged form's null-swallowing 0.0)
    // — unreachable from lshPlan, whose pair ids come from banded rows
    assert((1L to 6L).forall(i => native(i) == staged(i)),
      s"native=$native staged=$staged")
    assert(native(7L).isEmpty && staged(7L).contains(0.0))
  }

  test("JaccardSorted: 500 random sorted-set pairs equal the JVM set-math reference") {
    // randomized falsification: merge-count vs an independent
    // Set-intersection computation (not the Column chain — a DIFFERENT
    // implementation), on skewed sizes incl. empties and heavy overlap
    val rnd = new scala.util.Random(1234)
    val cases = (0 until 500).map { i =>
      val n = rnd.nextInt(40)
      val m = rnd.nextInt(40)
      val universe = 1 + rnd.nextInt(60) // small universe ⇒ real overlap
      val a = Seq.fill(n)(rnd.nextInt(universe).toLong).distinct.sorted
      val b = Seq.fill(m)(rnd.nextInt(universe).toLong).distinct.sorted
      (i.toLong, a, b)
    }
    val got = codegenOnly {
      cases.toDF("id", "a", "b")
        .select(col("id"), bridge.column(JaccardSorted(
          bridge.expression(col("a")), bridge.expression(col("b")))).as("j"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    cases.foreach { case (id, a, b) =>
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.size + b.size - inter
      val expect = if (union > 0) inter.toDouble / union else 0.0
      assert(got(id) == expect, s"case $id: a=$a b=$b")
    }
  }

  test("JaccardSorted through the REAL pipeline: q30 values unchanged") {
    // cross-validation on the real corpus: the native-verify pair list
    // equals the bands>4-style staged-verify pair list recomputed here
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val nativeVer = graft.dedup.Dedup.lshNearDupPairs(
        docs, "doc_id", "text", 3, 4, 0.1, cacheSignatures = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val sig = stagedLshSig(docs, 3, 4)
      .select(col("doc_id").as("id"), col("sh"), col("bands"))
    val banded = sig.select(col("id"), explode(col("bands")).as("band"))
      .filter(col("band").isNotNull)
    val pairs = banded.select(col("band"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("id").as("id_b")), Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    val stagedVer = pairs
      .join(sig.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(when(union > 0, inter / union).otherwise(lit(0.0)), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.1)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(nativeVer == stagedVer)
    assert(nativeVer.nonEmpty)
  }

  test("expressions sit inside a WholeStageCodegen span over the parquet scan") {
    // real files, not a local Seq — ConvertToLocalRelation would fold a
    // LocalRelation projection at optimization time and leave nothing
    // to inspect in the physical plan
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val df = docs.select(col("doc_id"),
      bridge.column(LshSignature(bridge.expression(col("text")), 3, 4)).as("sig"),
      bridge.column(SimHash32(bridge.expression(col("text")))).as("sh32"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_lsh_sig") && plan.contains("graft_simhash32"))
    // the "*(n)" star is toString's WholeStageCodegen-stage marker
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("Project") && l.contains("graft_lsh_sig")),
      s"projection must be inside a codegen stage:\n$plan")
    codegenOnly(assert(df.count() > 0))
  }
}
