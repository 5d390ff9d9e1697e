package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Importance (DSIR-style scoring) — model shape, ranking behavior,
  * artifact round trip, resample determinism. The q119/q120 gates pin
  * the full model + scores against DuckDB at sf0.01/sf0.1. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  private val target = Seq(
    (1L, "quantum physics waveform entangled"),
    (2L, "quantum entangled superposition physics")
  ).toDF("id", "text")

  private val raw = Seq(
    (10L, "buy cheap pills online now"),
    (11L, "cheap online casino buy now"),
    (12L, "quantum physics entangled notes"),   // target-like
    (13L, "")                                   // gram-less
  ).toDF("id", "text")

  private lazy val model = Importance.train(target, raw, "text", B)

  test("model covers every bucket exactly once, width tag constant") {
    assert(model.count() == B)
    assert(model.select("bucket").distinct().count() == B)
    assert(model.columns.toSeq == Seq("bucket", "w", "_b"))
    assert(model.select("_b").distinct().as[Int].collect().toSeq == Seq(B))
  }

  test("score reads the width off the _b tag — no model-sized count job") {
    // a model whose tag DISAGREES with its row count must score at the
    // tag's width: scores against a same-tag, fewer-rows model would
    // throw on a missing bucket or silently differ if score counted
    // rows. Here we just pin that the tag is authoritative: doubling
    // the tag re-buckets everything (different scores).
    val retagged = model.drop("_b").withColumn("_b", lit(B * 2))
    val a = Importance.score(raw.limit(1), "id", "text", model)
      .as[(Long, Long, Double)].collect().toSeq
    // buckets hashed mod 2B mostly miss the 64-row table -> the join
    // drops those grams, so n_grams shrinks (proves b came from _b)
    val b = Importance.score(raw.limit(1), "id", "text", retagged)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a.head._2 == 9L)
    assert(b.head._2 < 9L, s"width tag not authoritative: $b")
  }

  test("target-like doc outranks spam; gram-less doc scores zero") {
    val s = Importance.score(raw, "id", "text", model)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(s(12L)._2 > s(10L)._2, s"target-like ranked below spam: $s")
    assert(s(12L)._2 > s(11L)._2)
    assert(s(13L) == (0L, 0.0))
    // 5 words -> 5 unigrams + 4 bigrams
    assert(s(10L)._1 == 9L)
  }

  test("selectTopK returns the k best by (score desc, id)") {
    val top = Importance.selectTopK(raw, "id", "text", model, 1)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(12L))
  }

  test("model artifact round-trips; scores unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    Importance.saveModel(model, s"$dir/model")
    val loaded = Importance.loadModel(spark, s"$dir/model")
    val a = Importance.score(raw, "id", "text", model)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Importance.score(raw, "id", "text", loaded)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("loadModel rejects non-artifact inputs") {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/bad")
    val e = intercept[IllegalArgumentException] {
      Importance.loadModel(spark, s"$dir/bad")
    }
    assert(e.getMessage.contains("not an importance model"))
  }

  test("untagged (legacy) model rejected loudly by score and withScore") {
    val legacy = model.drop("_b")
    val e1 = intercept[IllegalArgumentException] {
      Importance.score(raw, "id", "text", legacy).collect()
    }
    assert(e1.getMessage.contains("_b"))
    val e2 = intercept[IllegalArgumentException] {
      Importance.withScore(raw, "id", "text", legacy).collect()
    }
    assert(e2.getMessage.contains("_b"))
  }

  test("loadModel rejects a truncated artifact (rows != width tag)") {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    Importance.saveModel(model.filter(col("bucket") < B / 2), s"$dir/trunc")
    val e = intercept[IllegalArgumentException] {
      Importance.loadModel(spark, s"$dir/trunc")
    }
    assert(e.getMessage.contains("width tag"))
  }

  test("production bucket count: train/score/withScore at 1M buckets") {
    // the published DSIR recipe hashes into ~10^5-10^6 buckets; pin
    // that the engine holds at the top of that range: the model stays
    // one broadcastable B-row frame and the per-row path's driver map
    // stays loadable
    val big = 1 << 20
    val m = Importance.train(target, raw, "text", big)
    assert(m.count() == big.toLong)
    val batch = Importance.score(raw, "id", "text", m)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val perRow = Importance.withScore(raw, "id", "text", m)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(perRow == batch)
    val s = batch.map(t => t._1 -> t._3).toMap
    assert(s(12L) > s(10L), s"ranking collapsed at 1M buckets: $s")
    // measure the per-row path's driver-map footprint (COVERAGE.md
    // documents the ceiling this pins)
    val est = org.apache.spark.util.SizeEstimator.estimate(
      m.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    info(f"1M-bucket model driver map ~= ${est / 1024.0 / 1024.0}%.1f MiB")
    assert(est < 512L * 1024 * 1024, "1M-bucket map no longer broadcast-safe")
  }

  test("resample is seed-deterministic and respects k") {
    def draw(seed: Int) =
      Importance.resample(raw, "id", "text", model, 2, seed)
        .select("id").as[Long].collect().sorted.toSeq
    assert(draw(7) == draw(7))
    assert(draw(7).size == 2)
  }

  test("plan pin: the model broadcasts into scoring (no corpus-side shuffle join)") {
    val plan = Importance.score(raw, "id", "text", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"model join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "scoring degraded to a sort-merge join")
  }

  test("withScore (per-row) == score (batch) on the real corpus") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    val target = docs.filter(col("doc_id") % 7 === 0)
    val rest = docs.filter(col("doc_id") % 7 =!= 0)
    val m = Importance.train(target, rest, "text", 512)
    val batch = Importance.score(docs, "doc_id", "text", m)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val perRow = Importance.withScore(docs, "doc_id", "text", m)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(perRow == batch)
  }

  test("withScore runs statelessly inside a document stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("dsirstream").toString
    val q = Importance.withScore(input.toDF().toDF("id", "text"),
        "id", "text", model)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    input.addData((1L, "quantum physics entangled"), (2L, ""))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out(0)._2 == 5L && out(1) == (2L, 0L, 0.0))
  }

  test("resample breaks score ties by noise, not id order") {
    // three identical docs → identical scores; the Gumbel draw decides,
    // so across seeds the winner must vary (id-ordered top-k would not)
    val same = Seq((1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "alpha beta")).toDF("id", "text")
    val winners = (1 to 12).map { s =>
      Importance.resample(same, "id", "text", model, 1, s)
        .select("id").as[Long].head()
    }.toSet
    assert(winners.size > 1, s"winner never varied: $winners")
  }
}
