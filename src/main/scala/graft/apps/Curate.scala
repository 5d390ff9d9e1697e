package graft.apps

import graft.dedup.{SimilarJoin, SimilarityMethod}
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The end-to-end curation pipeline a training-data user actually runs
  * — the extension operators composed in their canonical order, ONE
  * call: quality filter → exact dedup (keep min id per fingerprint) →
  * near-dup clustering (keep each cluster's min id) → token/language
  * report. The reference has no such program (it is a SQL transfer
  * tool); this is the §7 extension layer packaged the way a 100 TB
  * corpus job would submit it.
  *
  * Scale shape per stage: the quality score is a pure codegen'd column
  * (no shuffle); exact dedup projects (fingerprint, id) BEFORE its
  * min-agg so the heavy text column never rides the dedup shuffle, then
  * keeps winners via a left-semi join; near-dup clustering reuses
  * [[SimilarJoin.similarClusters]] (banded candidates, hot-bucket cap,
  * optional reliable checkpointing — all the knobs documented there);
  * the report is one small aggregation. Every stage count the report
  * carries is read off a persisted frame, so no stage is computed
  * twice, and every intermediate cache is RELEASED before return —
  * only the returned curated frame stays persisted (caller unpersists
  * after writing). */
object Curate {

  /** Per-stage row counts + the final corpus profile. */
  case class Report(input: Long, afterQuality: Long, afterExact: Long,
                    afterNear: Long, langProfile: Map[String, Long],
                    totalTokens: Long)

  def run(docs: DataFrame, idCol: String, textCol: String,
          minQuality: Double = 0.5,
          method: SimilarityMethod = SimilarityMethod.MinHashLsh(minJaccard = 0.8),
          log: String => Unit = m => System.err.println(m)): (DataFrame, Report) = {
    val input = docs.count()

    // stage 1: quality — pure map, the filter rides the scan
    val quality = docs
      .transform(TextOps.withQualityScore(_, textCol, "quality"))
      .filter(col("quality") >= minQuality)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterQuality = quality.count()
    log(s"[curate] quality >= $minQuality: $input -> $afterQuality")

    // stage 2: exact dedup, keep min id per normalized-text fingerprint.
    // (fp, id) only through the agg; winners fetched by semi join.
    val withFp = quality.withColumn("_fp", TextOps.fingerprint(col(textCol)))
    val keepIds = withFp.select(col("_fp"), col(idCol))
      .groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
    val exact = withFp.join(keepIds, Seq("_fp", idCol), "left_semi")
      .drop("_fp")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterExact = exact.count()
    quality.unpersist()
    log(s"[curate] exact dedup: $afterQuality -> $afterExact")

    // stage 3: near-dup clusters over the exact-deduped corpus; every
    // non-representative member (cluster != id) is dropped
    val clusters = SimilarJoin.similarClusters(exact, idCol, textCol, method)
    val dropIds = clusters.filter(col("cluster") =!= col("id"))
      .select(col("id").as(idCol))
    val curated = exact.join(dropIds, Seq(idCol), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterNear = curated.count()
    exact.unpersist()
    log(s"[curate] near dedup (${method.getClass.getSimpleName}): " +
      s"$afterExact -> $afterNear")

    // stage 4: profile of the surviving corpus — one small aggregation
    val profile = curated
      .transform(TextOps.withLangId(_, textCol, "_lang"))
      .groupBy(col("_lang"))
      .agg(count(lit(1)).as("n"), sum(TextOps.tokenCount(col(textCol))).as("toks"))
      .collect()
    val langProfile = profile.map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = profile.map(r => r.getLong(2)).sum
    log(s"[curate] kept $afterNear docs, $totalTokens tokens; languages: " +
      langProfile.toSeq.sortBy(_._1).map { case (l, n) => s"$l=$n" }.mkString(", "))

    (curated, Report(input, afterQuality, afterExact, afterNear,
      langProfile, totalTokens))
  }
}

/** `curate <sfDir> <outDir> [minQuality] [method] [checkpointDir]` —
  * read the `documents` table, run the full curation pipeline, write
  * the surviving rows as parquet, stage counts on stderr.
  *
  * `method`: a bare number or `minhash:<minJaccard>` selects
  * MinHash-LSH; `simhash:<maxHamming>` selects SimHash banding. With a
  * `checkpointDir` the near-dup clustering runs inside
  * [[graft.dedup.Dedup.withReliableClusters]] — fault-tolerant
  * parquet-snapshot rounds on a real cluster, every snapshot cleaned
  * up once the curated output is written. */
object CurateMain {

  private[apps] def parseMethod(s: String): SimilarityMethod = s match {
    case m if m.startsWith("simhash:") =>
      SimilarityMethod.SimHash(maxHamming = m.stripPrefix("simhash:").toInt)
    case m if m.startsWith("minhash:") =>
      SimilarityMethod.MinHashLsh(minJaccard = m.stripPrefix("minhash:").toDouble)
    case m => SimilarityMethod.MinHashLsh(minJaccard = m.toDouble)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2)
      throw new IllegalArgumentException(
        "usage: curate <sfDir> <outDir> [minQuality] [method] [checkpointDir]")
    val Array(sfDir, outDir, rest @ _*) = args.toSeq.toArray: @unchecked
    val minQuality = rest.headOption.map(_.toDouble).getOrElse(0.5)
    val method = rest.lift(1).map(parseMethod)
      .getOrElse(SimilarityMethod.MinHashLsh(minJaccard = 0.8))
    val spark = Mains.session("graft-curate")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def pipeline(): Unit = {
      val (curated, report) = Curate.run(docs, "doc_id", "text", minQuality,
        method)
      curated.write.mode("overwrite").parquet(outDir)
      curated.unpersist()
      println(s"[curate] ${report.input} in -> ${report.afterNear} out " +
        s"($outDir)")
    }
    rest.lift(2) match {
      case Some(ckpt) =>
        graft.dedup.Dedup.withReliableClusters(spark, ckpt) { pipeline() }
      case None => pipeline()
    }
    Mains.stop(spark)
  }
}
