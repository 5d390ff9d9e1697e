package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampling.mixtureEpochs — epoch arithmetic, partial-epoch
  * Bernoulli membership, source exclusion. q104 pins the corpus
  * composition against DuckDB. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // source s: 2 docs x 10 tokens; source t: 1 doc x 10; source x unlisted
  private val docs = Seq(
    (1L, "s", 10L), (2L, "s", 10L), (3L, "t", 10L), (4L, "x", 10L))
    .toDF("id", "src", "n")

  private def run(weights: Map[String, Double], budget: Long,
                  seed: Int = 0) =
    Sampling.mixtureEpochs(docs, "id", "src", "n", weights, budget, seed)
      .as[(Long, String, Long)].collect().toSeq.sorted

  test("full epochs replicate every doc; partial epoch follows the uniform") {
    // s: wanted=50, toks=20 → 2 full epochs + frac 0.5
    // t: wanted=25, toks=10 → 2 full epochs + frac 0.5
    val out = run(Map("s" -> 0.5, "t" -> 0.25), budget = 100, seed = 3)
    val full = for (id <- Seq(1L, 2L, 3L); ep <- 0L to 1L)
      yield (id, if (id == 3L) "t" else "s", ep)
    assert(out.filter(_._3 < 2) == full.sorted)
    // partial membership must equal the deterministic uniform draw
    val u = docs.select(col("id"),
        Sampling.uniform01(col("id"), 3).as("u"))
      .as[(Long, Double)].collect().toMap
    val expectPartial = Seq(1L, 2L, 3L).filter(u(_) < 0.5)
      .map(id => (id, if (id == 3L) "t" else "s", 2L))
    assert(out.filter(_._3 == 2) == expectPartial.sorted)
  }

  test("unlisted and zero-weight sources contribute nothing") {
    val out = run(Map("s" -> 0.0, "t" -> 1.0), budget = 10)
    // s weight 0 → nothing; t wanted=10=toks → exactly 1 full epoch
    assert(out == Seq((3L, "t", 0L)))
  }

  test("exact-multiple budget emits no partial epoch") {
    // s: wanted=40, toks=20 → 2 full epochs, frac 0 → epochs 0,1 only
    val out = run(Map("s" -> 1.0), budget = 40)
    assert(out == Seq((1L, "s", 0L), (1L, "s", 1L),
      (2L, "s", 0L), (2L, "s", 1L)))
  }
}
