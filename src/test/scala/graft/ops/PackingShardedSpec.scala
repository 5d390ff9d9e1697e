package graft.ops

import graft.{SparkSpec, Tables}
import graft.text.TextOps
import org.apache.spark.sql.functions.col

/** Packing.packSequencesSharded must be row-for-row identical to
  * packSequences for EVERY idBlock — the distributed prefix-sum is a
  * pure refactor of the physical shape. idBlock=1 stresses the offset
  * table (one shard per doc); a huge idBlock degenerates to one shard
  * per group = the plain path. The q87 gate additionally hashes it
  * against q84's DuckDB oracle at sf0.01/sf0.1. */
class PackingShardedSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[(String, Long, Long)], L: Int, block: Long) = {
    val df = rows.toDF("g", "id", "n")
    val key = (r: (String, Long, Long, Long, Long)) => (r._1, r._2, r._3)
    (Packing.packSequences(df, "id", "g", "n", L)
       .as[(String, Long, Long, Long, Long)].collect().sortBy(key).toSeq,
     Packing.packSequencesSharded(df, "id", "g", "n", L, block)
       .as[(String, Long, Long, Long, Long)].collect().sortBy(key).toSeq)
  }

  test("sharded == plain across idBlock granularities (hand data)") {
    val rows = Seq(
      ("a", 1L, 6L), ("a", 2L, 8L), ("a", 5L, 20L), ("a", 9L, 1L),
      ("b", 1L, 8L), ("b", 3L, 3L), ("b", 200L, 13L),
      ("c", 7L, 2L))
    for (block <- Seq(1L, 2L, 7L, 64L, 1000000L)) {
      val (plain, sharded) = both(rows, 8, block)
      assert(sharded == plain, s"idBlock=$block diverged")
      assert(plain.nonEmpty)
    }
  }

  test("sharded == plain with sparse, non-contiguous ids crossing shard edges") {
    // ids straddle the block-63/64 and 127/128 edges; zero-token docs drop
    val rows = Seq(("g", 63L, 5L), ("g", 64L, 5L), ("g", 65L, 0L),
      ("g", 127L, 9L), ("g", 128L, 9L), ("g", 1000L, 2L))
    val (plain, sharded) = both(rows, 4, 64L)
    assert(sharded == plain)
    assert(!plain.exists(_._3 == 65L)) // 0-token doc absent from both
  }

  test("sharded == plain on sf0.001 documents (the q87 gate shape)") {
    val docs = Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tok"))
    val key = (r: (String, Long, Long, Long, Long)) => (r._1, r._2, r._3)
    val plain = Packing.packSequences(docs, "doc_id", "source", "n_tok", 64)
      .select("source", "seq", "doc_id", "doc_from", "n_in_seq")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(key).toSeq
    val sharded = Packing
      .packSequencesSharded(docs, "doc_id", "source", "n_tok", 64, 16L)
      .select("source", "seq", "doc_id", "doc_from", "n_in_seq")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(key).toSeq
    assert(sharded == plain)
    assert(plain.nonEmpty)
  }
}
