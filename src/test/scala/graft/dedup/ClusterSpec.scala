package graft.dedup

import graft.SparkSpec

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("dupClusters: transitive chain collapses to one component") {
    // 1-2, 2-3, 3-4 chain + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dupClusters: diameter > 2 converges (long path, reversed labels)") {
    // path 9-8-7-6-5: min label must walk the whole path
    val pairs = Seq((8L, 9L), (7L, 8L), (6L, 7L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(5L))
    assert(got.keySet == Set(5L, 6L, 7L, 8L, 9L))
  }
}
