package graft.apps

import graft.dedup.{SimilarJoin, SimilarityMethod}
import graft.ops.{Packing, Profile, Sampling}
import graft.text.{C4Clean, Decontaminate, FilterPolicy, PolicyConfig, SpanDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The FULL published pre-training data-prep recipe as one pipeline —
  * what [[Curate]] is to curation, this is to corpus release: raw
  * crawl in, training shards out, every stage an operator this engine
  * already gates on its own:
  *
  *   1. Gopher policy gate ([[FilterPolicy]], config is the shipped
  *      artifact),
  *   2. C4 bad-words page drop ([[C4Clean.dropBadWordDocs]]),
  *   3. exact dedup (min id per [[graft.text.TextOps.fingerprint]] of
  *      the raw text — q24's operator; MUST run before the span scrub:
  *      scrubbing first would see every span of an exact-duplicate
  *      pair as a cross-document duplicate and annihilate BOTH
  *      copies),
  *   4. duplicated-span scrub ([[SpanDedup.removeDuplicatedSpans]] —
  *      Lee et al.'s cross-document boilerplate cut; `spanMinDocs`
  *      sets the multiplicity that counts as boilerplate — at the
  *      default 2 the scrub doubles as a hyper-aggressive near-dedup
  *      (both members of any near-dup pair lose their shared spans),
  *      at 3+ it targets boilerplate and leaves pair-wise similarity
  *      to the near-dup stage),
  *   5. near-dup dedup ([[SimilarJoin.similarClusters]], keep each
  *      cluster's min id),
  *   6. n-gram benchmark decontamination
  *      ([[Decontaminate.decontaminate]] — the published recipe uses
  *      13-grams; the gate corpus uses 5),
  *   7. optional EMBEDDING-space decontamination
  *      ([[Decontaminate.decontaminateByEmbedding]] — catches
  *      paraphrased eval questions n-grams miss),
  *   8. per-source quota ([[Sampling.capPerGroup]] — bounded heaps,
  *      keep the token-richest K per source),
  *   9. deterministic shuffle into training shards
  *      ([[Sampling.shuffleShards]]).
  *
  * Scale shape: every stage keeps its own discipline (documented at
  * each operator) — document text never rides a dedup or candidate
  * shuffle, the benchmark side broadcasts, quota is O(k) heaps, the
  * shuffle is one exchange + per-shard sort. Stage counts are read
  * off materialized stage frames (no stage computed twice).
  *
  * Stage boundaries cut the lineage by default ([[graft.ops.StageCut]]
  * — eager `localCheckpoint`): a nine-stage composed plan re-enters
  * Catalyst analysis at EVERY downstream action, and that constant
  * grows superlinearly with plan size — measured 4× on the q128 gate
  * (43.7 s chained-persist vs 10.8 s with stage cuts, identical
  * results). `spark.graft.stageCutLineage=false` reverts to plain
  * persist() for lineage-based recovery; see StageCut's scaladoc for
  * the full trade.
  *
  * The q128 gate pins stages 1-6 + 8-9 end-to-end against a DuckDB
  * oracle; `PretrainPrepSpec` pins run() == the hand-composed
  * operator chain stage by stage, plus the CLI's artifact layout.
  */
object PretrainPrep {

  /** Per-stage survivor counts. `afterEmbDecontam == afterDecontam`
    * when no embedding decontamination is configured. `input` is -1
    * when the run skipped the input count (`countInput = false`). */
  case class Report(input: Long, afterPolicy: Long, afterBadWords: Long,
                    afterExact: Long, afterSpanScrub: Long,
                    afterNear: Long, afterDecontam: Long,
                    afterEmbDecontam: Long, afterQuota: Long)

  /** Embedding-space decontamination input: per-document vectors and
    * the benchmark's vectors, both keyed by the pipeline's idCol. */
  case class EmbDecontam(docVecs: DataFrame, benchVecs: DataFrame,
                         vecCol: String, minCos: Double)

  /** Returns the training-ready frame `(idCol, srcCol, clean_text,
    * n_kept, shard, pos)` — already materialized (see
    * [[graft.ops.StageCut]] for the cleanup contract) — and the
    * per-stage [[Report]]. `bench` is the held-out eval set (same
    * textCol); pass None to skip decontamination. `docs` must not
    * contain the benchmark rows — exclude them before calling (the
    * corpus and the eval set are disjoint by construction in a real
    * release, and stage counts would otherwise mix the two). */
  def run(docs: DataFrame, idCol: String, textCol: String,
          srcCol: String,
          bench: Option[DataFrame] = None,
          config: PolicyConfig = PolicyConfig.Gopher,
          badWords: Seq[String] = Seq.empty,
          spanN: Int = 4,
          spanMinDocs: Int = 2,
          method: SimilarityMethod =
            SimilarityMethod.MinHashLsh(minJaccard = 0.8),
          decontamN: Int = 13,
          embDecontam: Option[EmbDecontam] = None,
          quotaPerSource: Int = Int.MaxValue,
          nShards: Int = 64,
          seed: Int = 0,
          countInput: Boolean = true,
          log: String => Unit = m => System.err.println(m)): (DataFrame, Report) = {
    // stage boundary: materialize + cut lineage (conf-revertible)
    val stage = (df: DataFrame) => graft.ops.StageCut(df)
    require(spanN >= 1, s"spanN must be >= 1, got $spanN")
    require(spanMinDocs >= 2, s"spanMinDocs must be >= 2, got $spanMinDocs")
    require(decontamN >= 1, s"decontamN must be >= 1, got $decontamN")
    require(quotaPerSource >= 1,
      s"quotaPerSource must be >= 1, got $quotaPerSource")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")

    // stage 1: policy gate. The input stat is a dedicated count():
    // free only when `docs` is a plain parquet scan (row-group counts,
    // no data read); a TRANSFORMED input pays one full scan here —
    // `countInput = false` skips it (Report.input becomes -1). The
    // Observation idiom cannot replace it — FilterPolicy scans its
    // input twice (signals + repetition aggregate), and an observe
    // node evaluated twice in one job double-counts.
    val input = if (countInput) docs.count() else -1L
    val keptIds = FilterPolicy(docs, idCol, textCol, config)
      .filter(col("keep")).select(col(idCol))
    val kept = docs.select(col(idCol), col(srcCol), col(textCol))
      .join(keptIds, Seq(idCol), "left_semi")
      .transform(stage)
    val afterPolicy = kept.count()
    log(s"[prep] policy gate: $input -> $afterPolicy")

    // stage 2: C4 bad-words page filter — pure in-row, rides the scan
    val noBad =
      (if (badWords.isEmpty) kept
       else C4Clean.dropBadWordDocs(kept, textCol, badWords))
        .transform(stage)
    val afterBadWords = noBad.count()
    graft.ops.StageCut.release(kept)
    log(s"[prep] bad-words (${badWords.size} terms): " +
      s"$afterPolicy -> $afterBadWords")

    // stage 3: exact dedup on the raw-text fingerprint — (fp, id)
    // only through the exchange, the heavy text never shuffles
    val winners = noBad
      .select(graft.text.TextOps.fingerprint(col(textCol)).as("_f"),
        col(idCol))
      .groupBy(col("_f")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val exact = noBad.join(winners, Seq(idCol), "left_semi")
      .transform(stage)
    val afterExact = exact.count()
    graft.ops.StageCut.release(noBad)
    log(s"[prep] exact dedup: $afterBadWords -> $afterExact")

    // stage 4: span scrub — text becomes clean_text (+ n_kept);
    // documents whose every token was boilerplate disappear
    val scrubbed = SpanDedup
      .removeDuplicatedSpans(exact, idCol, textCol, spanN, spanMinDocs)
      .join(exact.select(col(idCol), col(srcCol)), Seq(idCol))
      .transform(stage)
    val afterSpanScrub = scrubbed.count()
    graft.ops.StageCut.release(exact)
    log(s"[prep] span scrub (n=$spanN, minDocs=$spanMinDocs): " +
      s"$afterExact -> $afterSpanScrub")

    // stage 5: near-dup clusters over the scrubbed text
    val clusters = SimilarJoin.similarClusters(
      scrubbed.select(col(idCol), col("clean_text").as(textCol)),
      idCol, textCol, method)
    val dropIds = clusters.filter(col("cluster") =!= col("id"))
      .select(col("id").as(idCol))
    val near = scrubbed.join(dropIds, Seq(idCol), "left_anti")
      .transform(stage)
    val afterNear = near.count()
    graft.ops.StageCut.release(scrubbed)
    log(s"[prep] near dedup (${method.getClass.getSimpleName}): " +
      s"$afterSpanScrub -> $afterNear")

    // stage 6: n-gram decontamination (scrubbed text vs the raw bench)
    val dec = bench match {
      case Some(b) =>
        Decontaminate.decontaminate(
            near.withColumn(textCol, col("clean_text")), b,
            idCol, textCol, decontamN)
          .drop(textCol)
          .transform(stage)
      case None => near
    }
    val afterDecontam = dec.count()
    if (bench.isDefined) graft.ops.StageCut.release(near)
    log(s"[prep] $decontamN-gram decontamination: " +
      s"$afterNear -> $afterDecontam")

    // stage 7: embedding-space decontamination (optional). Only the
    // vectors of still-surviving docs probe the benchmark-side index.
    val embClean = embDecontam match {
      case Some(e) =>
        val liveVecs = e.docVecs
          .select(col(idCol), col(e.vecCol))
          .join(dec.select(col(idCol)), Seq(idCol), "left_semi")
        val keepIds = Decontaminate.decontaminateByEmbedding(
            liveVecs, e.benchVecs.select(col(idCol), col(e.vecCol)),
            idCol, e.vecCol, e.minCos)
          .select(col(idCol))
        dec.join(keepIds, Seq(idCol), "left_semi")
          .transform(stage)
      case None => dec
    }
    val afterEmbDecontam = embClean.count()
    if (embDecontam.isDefined) graft.ops.StageCut.release(dec)
    log(s"[prep] embedding decontamination: " +
      s"$afterDecontam -> $afterEmbDecontam")

    // stage 8: per-source quota — keep the token-richest K per source
    val quota =
      (if (quotaPerSource == Int.MaxValue) embClean
       else Sampling.capPerGroup(embClean, Seq(srcCol),
           Seq(("n_kept", false), (idCol, true)), quotaPerSource)
         .drop("rn"))
    // stage 9: deterministic shuffle into shards (adds shard, pos)
    val sharded = Sampling.shuffleShards(quota, idCol, nShards, seed)
      .transform(stage)
    val afterQuota = sharded.count()
    graft.ops.StageCut.release(embClean)
    log(s"[prep] quota (<= $quotaPerSource/source) + shuffle " +
      s"($nShards shards, seed $seed): $afterEmbDecontam -> $afterQuota")

    (sharded, Report(input, afterPolicy, afterBadWords, afterExact,
      afterSpanScrub, afterNear, afterDecontam, afterEmbDecontam,
      afterQuota))
  }
}

/** `pretrain-prep <sfDir> <outDir> [key=value...]` — the crawl-to-
  * shards release CLI: read the `documents` table, run the full
  * [[PretrainPrep.run]] recipe, and write the complete release layout:
  *
  *   - `data/` — the shards via [[graft.io.Publish.writePartitioned]]
  *     (partition-pruned by `shard`, rows clustered by `pos`: the
  *     written files ARE the shuffled epoch),
  *   - `manifest/` — the [[Packing.packSequences]] manifest packing
  *     each shard's documents in shuffled (`pos`) order into fixed
  *     `seqLen` sequences,
  *   - `card/` + `length_hist/` — [[Profile.datasetCard]] (when the
  *     table carries a `lang` column) and [[Profile.lengthHistogram]]
  *     over the released text,
  *   - `policy/` — the [[PolicyConfig]] artifact that produced the
  *     keep decisions ([[FilterPolicy.savePolicy]]).
  *
  * Options: `bench=<parquet>` (held-out eval set, enables
  * decontamination), `policy=<parquet>` (stored config artifact),
  * `badwords=a,b,c`, `spanN=4`, `method=minhash:0.8|simhash:<h>`,
  * `decontamN=13`, `embvecs=<parquet>` + `embbench=<parquet>` +
  * `veccol=embedding` + `mincos=0.98` (embedding decontamination),
  * `quota=<k>`, `shards=64`, `seed=0`, `seqLen=2048`. Stage counts
  * land on stderr. */
object PretrainPrepMain {

  private val usage =
    "usage: pretrain-prep <sfDir> <outDir> [bench=parquet] " +
      "[policy=parquet] [badwords=a,b,c] [spanN=4] [spanMinDocs=2] " +
      "[method=minhash:0.8] [decontamN=13] [embvecs=parquet] " +
      "[embbench=parquet] [veccol=embedding] [mincos=0.98] [quota=k] " +
      "[shards=64] [seed=0] [seqLen=2048]"
  private val knownKeys = Set("bench", "policy", "badwords", "spanN",
    "spanMinDocs", "method", "decontamN", "embvecs", "embbench",
    "veccol", "mincos", "quota", "shards", "seed", "seqLen")

  def main(args: Array[String]): Unit = {
    if (args.length < 2) throw new IllegalArgumentException(usage)
    val Array(sfDir, outDir, rest @ _*) = args.toSeq.toArray: @unchecked
    val opts = rest.map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if knownKeys(k) => k -> v
        case _ => throw new IllegalArgumentException(
          s"unrecognized option '$kv'\n$usage")
      }
    }.toMap
    require(opts.contains("embvecs") == opts.contains("embbench"),
      "embedding decontamination needs BOTH embvecs= and embbench=")
    val spark = Mains.session("graft-pretrain-prep")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val bench = opts.get("bench").map(p => spark.read.parquet(p))
    val config = opts.get("policy")
      .map(p => FilterPolicy.loadPolicy(spark, p))
      .getOrElse(PolicyConfig.Gopher)
    val emb = opts.get("embvecs").map { p =>
      PretrainPrep.EmbDecontam(
        spark.read.parquet(p),
        spark.read.parquet(opts("embbench")),
        opts.getOrElse("veccol", "embedding"),
        opts.get("mincos").map(_.toDouble).getOrElse(0.98))
    }
    val seqLen = opts.get("seqLen").map(_.toInt).getOrElse(2048)
    val (out, report) = PretrainPrep.run(docs, "doc_id", "text", "source",
      bench = bench, config = config,
      badWords = opts.get("badwords")
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty),
      spanN = opts.get("spanN").map(_.toInt).getOrElse(4),
      spanMinDocs = opts.get("spanMinDocs").map(_.toInt).getOrElse(2),
      method = opts.get("method").map(CurateMain.parseMethod)
        .getOrElse(SimilarityMethod.MinHashLsh(minJaccard = 0.8)),
      decontamN = opts.get("decontamN").map(_.toInt).getOrElse(13),
      embDecontam = emb,
      quotaPerSource = opts.get("quota").map(_.toInt)
        .getOrElse(Int.MaxValue),
      nShards = opts.get("shards").map(_.toInt).getOrElse(64),
      seed = opts.get("seed").map(_.toInt).getOrElse(0))

    // data/: partition pruning on shard, row groups clustered by pos
    val written = graft.io.Publish.writePartitioned(out, s"$outDir/data",
      Seq("shard"), "pos")
    // manifest/: pack each shard's docs in SHUFFLED (pos) order
    Packing.packSequences(out, "pos", "shard", "n_kept", seqLen)
      .join(out.select(col("shard"), col("pos"), col("doc_id")),
        Seq("shard", "pos"))
      .write.mode("overwrite").parquet(s"$outDir/manifest")
    // card/ + length_hist/ over the RELEASED text
    if (docs.columns.contains("lang")) {
      Profile.datasetCard(
          out.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
            .withColumnRenamed("clean_text", "text"),
          "source", "lang", "text")
        .write.mode("overwrite").parquet(s"$outDir/card")
    } else System.err.println("[prep] no lang column — card skipped")
    Profile.lengthHistogram(
        out.withColumnRenamed("clean_text", "text"), "text")
      .write.mode("overwrite").parquet(s"$outDir/length_hist")
    FilterPolicy.savePolicy(spark, config, s"$outDir/policy")
    graft.ops.StageCut.release(out)
    println(s"[prep] ${report.input} in -> ${report.afterQuota} docs / " +
      s"$written rows published under $outDir")
    Mains.stop(spark)
  }
}
