package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EntityResolve.resolveBatch — match-vs-new verdicts, closest-master
  * tie-break, artifact-probe equivalence, incremental ≡ full-run
  * equivalence. The q118 gate pins the corpus-scale composition
  * against DuckDB. */
class EntityResolveSpec extends SparkSpec {
  import spark.implicits._

  private val master = Seq(
    (1L, "golden widget"),
    (2L, "copper spring"),
    (3L, "silver bearing")
  ).toDF("eid", "name")

  // loan form: the resolved frame is released by the API, not the test
  private def resolve(batch: Seq[(Long, String)],
                      keys: Option[org.apache.spark.sql.DataFrame] = None) =
    EntityResolve.withResolvedBatch(batch.toDF("rid", "name"), master,
        "rid", "name", "eid", "name", maxDist = 2, masterKeys = keys) {
      _.as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    }

  test("matched rows adopt the closest master; new rows cluster") {
    val out = resolve(Seq(
      (10L, "golden widget"),    // exact → eid 1 at dist 0
      (11L, "coppre spring"),    // transposition → eid 2 at dist 2
      (12L, "brand new entity"), // no master, no twin → itself
      (13L, "brand new entitx"), // pairs with 12 → component 12
      (14L, "wholly unrelated")))
    assert(out == Seq(
      (10L, 1L, 0L, true),
      (11L, 2L, 2L, true),
      (12L, 12L, 0L, false),
      (13L, 12L, 0L, false),
      (14L, 14L, 0L, false)))
  }

  test("ambiguous record takes the closest master, ties by min id") {
    // both masters sit at dist 1 from the probe → tie → min id wins
    val twoClose = Seq(
      (1L, "copper sprind"),
      (2L, "copper sprinx")
    ).toDF("eid", "name")
    val out = EntityResolve.withResolvedBatch(
        Seq((10L, "copper sprinq")).toDF("rid", "name"), twoClose,
        "rid", "name", "eid", "name", maxDist = 2) {
      _.as[(Long, Long, Long, Boolean)].collect().toSeq
    }
    assert(out == Seq((10L, 1L, 1L, true)))
  }

  test("stored entityKeys artifact probes identically to inline keys") {
    val keys = Fuzzy.entityKeys(master, "eid", "name", maxDist = 2)
    val batch = Seq((10L, "golden widgex"), (11L, "novel record"))
    assert(resolve(batch, Some(keys)) == resolve(batch))
  }

  test("artifact built at a different maxDist is rejected loudly") {
    val keys = Fuzzy.entityKeys(master, "eid", "name", maxDist = 1)
    val e = intercept[IllegalArgumentException] {
      EntityResolve.resolveBatch(
        Seq((10L, "golden widget")).toDF("rid", "name"), master,
        "rid", "name", "eid", "name", maxDist = 2,
        masterKeys = Some(keys)).collect()
    }
    assert(e.getMessage.contains("maxDist"))
  }

  test("artifact stored before the middle-window key scheme is rejected") {
    // a pre-scheme artifact would PASS the _w check but lack the 'm'
    // keys the probe fans — it must fail loudly, not silently miss
    // the pairs only the middle pass can generate
    val legacy = Fuzzy.entityKeys(master, "eid", "name", maxDist = 2)
      .drop("_v")
    val e = intercept[IllegalArgumentException] {
      EntityResolve.resolveBatch(
        Seq((10L, "golden widget")).toDF("rid", "name"), master,
        "rid", "name", "eid", "name", maxDist = 2,
        masterKeys = Some(legacy)).collect()
    }
    assert(e.getMessage.contains("rebuilt") ||
      e.getMessage.contains("rebuild"))
  }

  test("incremental resolve equals the full-run clustering") {
    // b1 seeds the registry (its q115-style self-cluster reps); b2
    // resolves incrementally. With b1 ids < b2 ids and no b2 record
    // bridging two b1 entities, incremental entity ids must equal the
    // full self-cluster labels over b1 ∪ b2.
    val b1 = Seq((1L, "golden widget"), (2L, "copper spring"),
      (3L, "golden widgex"))                 // 3 clusters with 1
    val b2 = Seq((10L, "golden widgez"), (11L, "novel entity aa"),
      (12L, "novel entity ab"))
    val full = {
      val all = (b1 ++ b2).toDF("id", "name")
      val prs = Fuzzy.fuzzyJoinAgainst(
          all.select(col("id").as("id_a"), col("name")),
          all.select(col("id").as("id_b"), col("name")),
          "id_a", "name", "id_b", "name", maxDist = 2)
        .filter(col("id_a") < col("id_b"))
      val clus = Dedup.dupClusters(prs)
      all.select(col("id")).join(clus, Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster"), col("id")).as("ent"))
        .as[(Long, Long)].collect().toMap
    }
    // registry = b1's component representatives
    val b1df = b1.toDF("id", "name")
    val reps = b1df.filter(col("id").isin(
      b1.map(_._1).filter(i => full(i) == i): _*))
    val inc = EntityResolve.withResolvedBatch(b2.toDF("rid", "name"),
        reps.select(col("id").as("eid"), col("name")),
        "rid", "name", "eid", "name", maxDist = 2) {
      _.as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> r._2).toMap
    }
    b2.map(_._1).foreach { id =>
      assert(inc(id) == full(id), s"record $id: inc=${inc(id)} full=${full(id)}")
    }
  }

  test("newEntities returns exactly the fresh component representatives") {
    val batch = Seq((10L, "golden widget"), (12L, "brand new entity"),
      (13L, "brand new entitx")).toDF("rid", "name")
    val fresh = EntityResolve.withResolvedBatch(batch, master,
        "rid", "name", "eid", "name", maxDist = 2) { resolved =>
      EntityResolve.newEntities(batch, resolved, "rid")
        .select("rid").as[Long].collect().sorted.toSeq
    }
    assert(fresh == Seq(12L))
  }
}
