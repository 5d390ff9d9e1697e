package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r20 optimization scratch harness: times named ALTERNATIVE
  * implementations of gate computations head-to-head (noop sink,
  * min-of-N) so path-swap decisions are made on measurements, not
  * guesses. Not part of the engine surface. */
object OptProbe {

  private def time(spark: SparkSession, fn: => DataFrame): Double = {
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    fn.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val reps = sys.env.getOrElse("OPT_PROBE_REPS", "3").toInt
    val spark = GraftSession.build("graft-optprobe", s"local[$cpus]")
    spark.sparkContext.setLogLevel("ERROR")
    def T(n: String) = Tables.load(spark, sfDir, n)

    val docs = T("documents")

    // ---- unigram: expression path vs mapPartitions twin -------------
    val vocab = graft.text.Unigram.trainUnigram(
      docs.filter(col("doc_id") % 2 === 0), "text",
      vocabSize = 40, maxPieceLen = 4, seedMulti = 48, emIters = 1)
    val odd = docs.filter(col("doc_id") % 2 === 1)

    def uniExpr() = graft.text.Unigram.withUnigramTokensExpr(
      odd, "doc_id", "text", vocab).orderBy(col("doc_id"), col("pos"))
    def uniPart() = graft.text.Unigram.withUnigramTokensPartitioned(
      odd, "doc_id", "text", vocab).orderBy(col("doc_id"), col("pos"))

    // ---- decontaminate: probe join vs per-row mapPartitions ---------
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val bench = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 7 === 0)
    def decJoin() = graft.text.Decontaminate.contaminationReport(
      corpus, bench, "doc_id", "text", n = 3).orderBy(col("doc_id"))
    def decRow() = graft.text.Decontaminate.withContamination(
      corpus, "doc_id", "text", bench, n = 3).orderBy(col("doc_id"))

    // ---- policy/repetition: composed twins vs the one-pass scan -----
    def polJoined() = graft.text.FilterPolicy.applyJoined(
      docs, "doc_id", "text").orderBy(col("doc_id"))
    def polOnePass() = graft.text.FilterPolicy(
      docs, "doc_id", "text").orderBy(col("doc_id"))
    def polRowHof() = graft.text.FilterPolicy.withDecisionComposed(
      docs, "doc_id", "text").orderBy(col("doc_id"))
    def repAgg() = graft.text.TextOps.repetitionStatsAgg(
      docs, "doc_id", "text").orderBy(col("doc_id"))
    def repOnePass() = graft.text.TextOps.repetitionStats(
      docs, "doc_id", "text").orderBy(col("doc_id"))

    val cases: Seq[(String, () => DataFrame)] = Seq(
      "uni_expr" -> (uniExpr _),
      "uni_part" -> (uniPart _),
      "dec_join" -> (decJoin _),
      "dec_row" -> (decRow _),
      "pol_joined" -> (polJoined _),
      "pol_onepass" -> (polOnePass _),
      "pol_rowhof" -> (polRowHof _),
      "rep_agg" -> (repAgg _),
      "rep_onepass" -> (repOnePass _))

    if (sys.env.contains("OPT_PROBE_STAGELOG"))
      spark.conf.set(graft.ops.StageCut.LogKey, "true")

    // any declared gate runs by name too (stageCutLog + reps timing —
    // the pipeline-boundary instrumentation loop)
    val gateCases: Seq[(String, () => DataFrame)] =
      args.toSeq.filter(SparkEntry.queries.contains).map(n =>
        n -> (() => SparkEntry.queries(n)(spark, sfDir)))

    val sel = if (args.nonEmpty) args.toSet else cases.map(_._1).toSet
    (cases.filter(c => sel.contains(c._1)) ++ gateCases).foreach {
      case (name, fn) =>
        time(spark, fn()) // untimed codegen warm-up
        val ts = (1 to reps).map(_ => time(spark, fn()))
        println(f"[optprobe] $name%-10s min=${ts.min}%7.3f  " +
          ts.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
