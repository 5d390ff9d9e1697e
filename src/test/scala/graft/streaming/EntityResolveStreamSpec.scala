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
    try {
      val reg0 = EntityResolve.newEntities(b0, r0, "rid")
      val reg0Ids = reg0.select("rid").as[Long].collect().sorted.toSeq
      val expected = EntityResolve.withResolvedBatch(b1,
          reg0.select(col("rid").as("eid"), col("name")),
          "rid", "name", "eid", "name", 2) { r1 =>
        (r0.as[(Long, Long, Long, Boolean)].collect() ++
          r1.as[(Long, Long, Long, Boolean)].collect()).sortBy(_._1).toSeq
      }
      assert(asg(dir) == expected)
      // registry = b0 reps + b1's fresh reps
      assert(reg(dir).map(_._1) == reg0Ids ++ Seq(21L))
      // the cross-batch match went to the right entity
      assert(asg(dir).contains((20L, 10L, 1L, true)))
    } finally graft.ops.StageCut.release(r0)
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

  test("compact folds state without changing any read; later batches " +
      "run identically to an uncompacted twin") {
    val a = tmp(); val b = tmp()
    val batches = Seq(
      Seq((10L, "golden widget"), (11L, "copper spring")),
      Seq((20L, "golden widgex")),
      Seq((30L, "novel record aa"), (31L, "novel record ab")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("rid", "name")
      EntityResolveStream.processBatch(df, i.toLong, "rid", "name", 2, a)
      EntityResolveStream.processBatch(df, i.toLong, "rid", "name", 2, b)
    }
    val before = (reg(a), asg(a))
    EntityResolveStream.compact(spark, a)
    assert((reg(a), asg(a)) == before, "compact changed a read")
    def newDirs() = new java.io.File(s"$a/new").listFiles
      .map(_.getName).sorted.toSeq
    // the history below the newest marker folded into ONE snapshot;
    // the covered b-dirs stay for one cycle (DEFERRED GC — in-flight
    // readers keep their files)
    assert(newDirs() == Seq("b0", "b1", "b2", "c0_1"),
      s"unexpected layout after first compact: ${newDirs()}")
    // the compacted registry keeps serving batches exactly like the twin
    val b3 = Seq((40L, "golden widgez"), (41L, "novel record ac"))
      .toDF("rid", "name")
    EntityResolveStream.processBatch(b3, 3L, "rid", "name", 2, a)
    EntityResolveStream.processBatch(b3, 3L, "rid", "name", 2, b)
    assert((reg(a), asg(a)) == ((reg(b), asg(b))))
    // compact #2 reclaims what the FIRST snapshot superseded and folds
    // the next tail; compact #3 reclaims the superseded first snapshot
    EntityResolveStream.compact(spark, a)
    assert(newDirs() == Seq("b2", "b3", "c0_1", "c1_2"),
      s"deferred GC broke the cycle: ${newDirs()}")
    EntityResolveStream.compact(spark, a)
    assert(newDirs() == Seq("b3", "c1_2"),
      s"second cycle did not reclaim the superseded dirs: ${newDirs()}")
    assert((reg(a), asg(a)) == ((reg(b), asg(b))))
  }

  test("crash mid-compact is invisible; the next compact completes") {
    val dir = tmp()
    EntityResolveStream.processBatch(
      Seq((10L, "alpha name")).toDF("rid", "name"), 0L, "rid", "name", 2, dir)
    EntityResolveStream.processBatch(
      Seq((20L, "beta name")).toDF("rid", "name"), 1L, "rid", "name", 2, dir)
    val before = (reg(dir), asg(dir))
    // a crashed compact = a half-written tmp dir full of garbage
    val tmpDir = new java.io.File(s"$dir/new/_tmp_c0_0")
    tmpDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/new/_tmp_c0_0/part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    assert((reg(dir), asg(dir)) == before, "tmp dir leaked into reads")
    EntityResolveStream.compact(spark, dir)
    assert((reg(dir), asg(dir)) == before)
    assert(!tmpDir.exists, "stale tmp dir not cleaned by the next compact")
  }

  test("stray non-batch dirs under state are ignored, not fatal") {
    val dir = tmp()
    EntityResolveStream.processBatch(
      Seq((10L, "alpha name")).toDF("rid", "name"), 0L, "rid", "name", 2, dir)
    new java.io.File(s"$dir/new/backup").mkdirs()
    new java.io.File(s"$dir/assign/backup").mkdirs()
    assert(reg(dir) == Seq((10L, "alpha name")))
    assert(asg(dir) == Seq((10L, 10L, 0L, false)))
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

  test("autoCompactEvery: identical results to the uncompacted twin, " +
      "bounded dir counts, later batches resolve against folded state") {
    val batches = Seq(
      Seq((10L, "golden widget"), (11L, "copper spring")),
      Seq((20L, "golden widgeq"), (21L, "novel record aa")),
      Seq((30L, "novel record ax")), // matches 21 post-first-compact
      Seq((40L, "copper sprinq")),   // matches 11, by then FOLDED
      Seq((50L, "fresh item zz")))
    def run(dir: String, every: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = EntityResolveStream.start(input.toDF().toDF("rid", "name"),
        "rid", "name", maxDist = 2, dir,
        checkpointLocation = Some(s"$dir/ckpt"), autoCompactEvery = every)
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }
    val (a, twin) = (tmp(), tmp())
    run(a, 2); run(twin, 0)
    assert(reg(a) == reg(twin), "registry diverged under auto-compact")
    assert(asg(a) == asg(twin), "assignments diverged under auto-compact")
    // the batch-3 record matched entity 11 from batch 0 — whose dirs
    // the batch-1 auto-compact had already folded into a snapshot
    assert(asg(a).contains((40L, 11L, 1L, true)))
    // bounded growth: every subdir carries a snapshot and strictly
    // fewer live b-dirs than the 5 triggers the twin accumulated
    for (sub <- Seq("new", "keys", "assign")) {
      val names = new java.io.File(s"$a/$sub").list().toSeq
      assert(names.exists(_.startsWith("c")), s"$sub has no snapshot")
      assert(names.count(_.startsWith("b")) <
        new java.io.File(s"$twin/$sub").list().count(_.startsWith("b")),
        s"$sub not bounded: $names")
    }
  }
}
