package graft.streaming

import graft.SparkSpec
import graft.dedup.{EntityResolve, Fuzzy}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** EntityResolveStream — streamed registry maintenance: micro-batch
  * composition vs chained batch resolves, replay idempotence,
  * crash-window consistency, MemoryStream end-to-end. */
class EntityResolveStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("entstream").toString

  private def reg(dir: String) =
    EntityResolveStream.registry(spark, dir)
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  private def asg(dir: String) =
    EntityResolveStream.assignments(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq

  test("two processBatch calls equal the chained batch resolves") {
    val dir = tmp()
    val b0 = Seq((10L, "golden widget"), (11L, "copper spring"),
      (12L, "golden widgex")).toDF("rid", "name")
    val b1 = Seq((20L, "golden widgez"),        // matches entity 10
      (21L, "novel record aa"), (22L, "novel record ab")).toDF("rid", "name")
    EntityResolveStream.processBatch(b0, 0L, "rid", "name", 2, dir)
    EntityResolveStream.processBatch(b1, 1L, "rid", "name", 2, dir)

    // chained batch equivalent: b0 against empty, b1 against b0's reps
    val r0 = EntityResolve.resolveBatch(b0,
      b0.select(col("rid").as("eid"), col("name")).limit(0),
      "rid", "name", "eid", "name", 2)
    val reg0 = EntityResolve.newEntities(b0, r0, "rid")
    val r1 = EntityResolve.resolveBatch(b1,
      reg0.select(col("rid").as("eid"), col("name")),
      "rid", "name", "eid", "name", 2)
    val expected = (r0.as[(Long, Long, Long, Boolean)].collect() ++
      r1.as[(Long, Long, Long, Boolean)].collect()).sortBy(_._1).toSeq
    assert(asg(dir) == expected)
    // registry = b0 reps + b1's fresh reps
    assert(reg(dir).map(_._1) ==
      (reg0.select("rid").as[Long].collect().sorted.toSeq ++ Seq(21L)))
    // the cross-batch match went to the right entity
    assert(asg(dir).contains((20L, 10L, 1L, true)))
  }

  test("replaying a batch id rewrites identically") {
    val dir = tmp()
    val b0 = Seq((10L, "alpha name")).toDF("rid", "name")
    val b1 = Seq((20L, "alpha namq")).toDF("rid", "name")
    EntityResolveStream.processBatch(b0, 0L, "rid", "name", 2, dir)
    EntityResolveStream.processBatch(b1, 1L, "rid", "name", 2, dir)
    val once = (reg(dir), asg(dir))
    EntityResolveStream.processBatch(b1, 1L, "rid", "name", 2, dir)
    assert((reg(dir), asg(dir)) == once)
    assert(asg(dir) == Seq((10L, 10L, 0L, false), (20L, 10L, 1L, true)))
  }

  test("orphan new/bN without its assign marker stays invisible") {
    val dir = tmp()
    val b0 = Seq((10L, "alpha name")).toDF("rid", "name")
    EntityResolveStream.processBatch(b0, 0L, "rid", "name", 2, dir)
    val before = (reg(dir), asg(dir))
    // simulate a crash after new/keys, before assign
    Seq((30L, "phantom entity")).toDF("rid", "name")
      .write.parquet(s"$dir/new/b1")
    assert((reg(dir), asg(dir)) == before,
      "half-applied batch leaked into the read API")
  }

  test("seeded registry resolves without any completed batch") {
    val dir = tmp()
    val seed = Seq((1L, "golden widget")).toDF("rid", "name")
    seed.write.parquet(s"$dir/new/b-1")
    Fuzzy.entityKeys(seed.select(col("rid").as("_eid"), col("name")),
        "_eid", "name", 2)
      .write.parquet(s"$dir/keys/b-1")
    assert(reg(dir) == Seq((1L, "golden widget")))
    EntityResolveStream.processBatch(
      Seq((10L, "golden widgex")).toDF("rid", "name"), 0L,
      "rid", "name", 2, dir)
    assert(asg(dir) == Seq((10L, 1L, 1L, true)))
  }

  test("MemoryStream end-to-end matches the batch composition") {
    val dir = tmp()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((10L, "golden widget"), (11L, "copper spring"))
    val q = EntityResolveStream.start(input.toDF().toDF("rid", "name"),
      "rid", "name", maxDist = 2, dir,
      checkpointLocation = Some(s"$dir/ckpt"))
    q.processAllAvailable()
    input.addData((20L, "golden widgeq"))
    q.processAllAvailable()
    q.stop()
    assert(reg(dir) == Seq((10L, "golden widget"), (11L, "copper spring")))
    assert(asg(dir) == Seq(
      (10L, 10L, 0L, false),
      (11L, 11L, 0L, false),
      (20L, 10L, 1L, true)))
  }
}
