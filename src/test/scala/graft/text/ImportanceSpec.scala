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

  test("model covers every bucket exactly once") {
    assert(model.count() == B)
    assert(model.select("bucket").distinct().count() == B)
    assert(model.columns.toSeq == Seq("bucket", "w"))
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
