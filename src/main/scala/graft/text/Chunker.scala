package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window token chunking — the context-window preparation
  * step for embedding/RAG pipelines: each document becomes
  * overlapping chunks of `size` tokens advancing by `stride`
  * (overlap = size − stride carries context across boundaries, the
  * standard retrieval-chunking recipe). Deterministic, schema-stable
  * output: `(id, chunk_id, start_tok, end_tok, chunk_text)`.
  *
  * Shape at 100 TB: pure per-row work — tokenize once, explode one
  * `sequence` of chunk ids (each row emits its own count), `slice` +
  * `array_join` per chunk. No shuffle at all; chunk rows land in the
  * same partition as their document, ready for a downstream
  * embedding pass or [[graft.ops.Packing]].
  */
object Chunker {

  /** Chunk ids run 0 .. (n−1) DIV stride — every start strictly
    * inside the document; the final chunk may be shorter than
    * `size` (kept, not merged — the consumer decides). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    df.select(col(idCol), toks.as("_w"))
      .withColumn("_n", arrLen(col("_w")).cast("long"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          expr(s"CAST((_n - 1) DIV $stride AS BIGINT)"))))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("end_tok",
        least(col("start_tok") + size, col("_n")) - 1)
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        col("end_tok"),
        array_join(slice(col("_w"), (col("start_tok") + 1).cast("int"),
          (col("end_tok") - col("start_tok") + 1).cast("int")), " ")
          .as("chunk_text"))
  }

  // functions.size shadowed by the `size` parameter above
  private def arrLen(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
