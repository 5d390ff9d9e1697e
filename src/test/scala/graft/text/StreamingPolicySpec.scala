package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** The per-row policy path: withRepetitionCols must equal the
  * aggregate repetitionStats value-for-value, withDecision must equal
  * the batch FilterPolicy verdict-for-verdict, and the whole policy
  * must run inside a Structured Streaming query (stateless — no
  * watermark, no output-mode constraint) producing the same rows. */
class StreamingPolicySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, sf(), "documents").select("doc_id", "text")

  test("withRepetitionCols == repetitionStats on the real corpus") {
    val agg = TextOps.repetitionStats(docs, "doc_id", "text")
      .select("doc_id", "top2_frac", "dup5_frac")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    val cols = TextOps.withRepetitionCols(docs, "text", "t2", "d5")
      .select("doc_id", "t2", "d5")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(cols == agg) // exact double equality — same integer products
    assert(agg.nonEmpty)
  }

  test("withRepetitionCols edge docs match the aggregate version") {
    val edge = Seq((1L, ""), (2L, "one"), (3L, "a b"), (4L, "a b c d e"),
      (5L, ("x y " * 30).trim)).toDF("doc_id", "text")
    val agg = TextOps.repetitionStats(edge, "doc_id", "text")
      .select("doc_id", "top2_frac", "dup5_frac")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    val cols = TextOps.withRepetitionCols(edge, "text", "t2", "d5")
      .select("doc_id", "t2", "d5")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(cols == agg)
  }

  test("one-pass FilterPolicy == both composed twins on the real corpus") {
    // r20: apply/withDecision are one PolicySignals scan; the pre-r20
    // signals-join and per-row-HOF forms stay as independently-derived
    // twins and must agree verdict-for-verdict (and on every signal
    // column) with the scan path
    val onePass = FilterPolicy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Boolean, String)].collect().sortBy(_._1).toSeq
    val joined = FilterPolicy.applyJoined(docs, "doc_id", "text")
      .as[(Long, Long, Long, Boolean, String)].collect().sortBy(_._1).toSeq
    val perRow = FilterPolicy.withDecisionComposed(docs, "doc_id", "text")
      .as[(Long, Long, Long, Boolean, String)].collect().sortBy(_._1).toSeq
    assert(onePass == joined)
    assert(onePass == perRow)
    assert(onePass.nonEmpty)
  }

  test("the policy filters a document stream statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    val rows = docs.as[(Long, String)].collect().sortBy(_._1).take(40).toSeq
    input.addData(rows.take(20): _*)
    input.addData(rows.drop(20): _*)

    val q = FilterPolicy.withDecision(stream, "doc_id", "text")
      .filter(col("keep"))
      .writeStream.format("memory").queryName("policy_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("policy_stream")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val batch = FilterPolicy(rows.toDF("doc_id", "text"), "doc_id", "text")
      .filter(col("keep")).select("doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("chunking and PII scrub run unchanged on a document stream") {
    // both are stateless per-row transforms (explode/HOF work), so the
    // crawl-time pipeline chunk-and-scrub needs no watermark or state
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    val rows = docs.as[(Long, String)].collect().sortBy(_._1).take(30)
      .map { case (id, t) =>
        (id, t + s" card 4111-1111-1111-1111 ssn 123-45-6789") }.toSeq
    input.addData(rows.take(15): _*)
    input.addData(rows.drop(15): _*)

    val scrubbed = Pii.withExtendedRedaction(stream, "text", "red")
    val q = Chunker.chunkByTokens(
        scrubbed.select(col("doc_id"), col("red")), "doc_id", "red",
        size = 16, stride = 12)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("chunk_stream")
      .select("doc_id", "chunk_id", "start_tok", "end_tok", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = Chunker.chunkByTokens(
        Pii.withExtendedRedaction(rows.toDF("doc_id", "text"), "text",
          "red").select(col("doc_id"), col("red")),
        "doc_id", "red", size = 16, stride = 12)
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // the scrub really happened before chunking
    assert(streamed.exists(_._5.contains("<cc>")) ||
      streamed.exists(_._5.contains("<ssn>")))
    assert(!streamed.exists(_._5.contains("4111-1111-1111-1111")))
  }
}
