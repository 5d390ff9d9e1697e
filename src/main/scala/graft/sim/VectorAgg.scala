package graft.sim

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector aggregation as a typed `Aggregator` (SURVEY
  * §2.9's custom-aggregate surface). The naive centroid plan explodes
  * each vector into `dim` rows before a hash-agg — a dim× blowup of
  * shuffle input. This aggregator folds vectors into one running
  * double[] per group map-side, so the shuffle carries ONE row per
  * (group × partition): the partial-aggregation shape that matters
  * when embeddings are 100 TB. */
object VectorAgg {

  /** Sum + count buffer → mean vector at finish. */
  val vectorMean: Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] =
    new Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
      override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

      override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
        if (v == null) return b
        val acc = if (b._1.length == 0) new Array[Double](v.length) else b._1
        require(acc.length == v.length,
          s"vector length mismatch: ${acc.length} vs ${v.length}")
        var i = 0
        while (i < v.length) { acc(i) += v(i); i += 1 }
        (acc, b._2 + 1)
      }

      override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
        if (a._1.length == 0) return b
        if (b._1.length == 0) return a
        require(a._1.length == b._1.length, "vector length mismatch in merge")
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }

      override def finish(r: (Array[Double], Long)): Seq[Double] =
        if (r._2 == 0) Seq.empty
        else r._1.map(_ / r._2).toSeq

      override def bufferEncoder: Encoder[(Array[Double], Long)] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Column form: `vector_mean(embedding)` over a group. */
  def vectorMeanCol(c: Column): Column = udaf(vectorMean).apply(c)
}
