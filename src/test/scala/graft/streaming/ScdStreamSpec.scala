package graft.streaming

import graft.SparkSpec
import graft.ops.Scd
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ScdStream — streamed SCD2 dimension maintenance: micro-batch
  * composition vs chained batch applies, replay idempotence,
  * MemoryStream end-to-end. */
class ScdStreamSpec extends SparkSpec {
  import spark.implicits._

  private def dim(dir: String) =
    ScdStream.dimension(spark, dir)
      .as[(Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  private def tmp() =
    java.nio.file.Files.createTempDirectory("scdstream").toString

  test("two processBatch calls equal the chained batch applies") {
    val dir = tmp()
    val b0 = Seq((1L, "oslo"), (2L, "rome")).toDF("pk", "city")
    val b1 = Seq((1L, "lima"), (3L, "baku")).toDF("pk", "city")
    ScdStream.processBatch(b0, 0L, "pk", Seq("city"), dir,
      closeMissing = false)
    ScdStream.processBatch(b1, 1L, "pk", Seq("city"), dir,
      closeMissing = false)

    val empty = b0.limit(0)
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
    val afterB0 = Scd.scd2Apply(empty, b0, "pk", Seq("city"), 0L)
    val afterB1 = Scd.scd2Apply(afterB0, b1, "pk", Seq("city"), 1L)
    val expected = afterB1.as[(Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(dim(dir) == expected)
    // sanity: pk 1 has a closed v0 and an open v1
    assert(dim(dir).contains((1L, "oslo", 0L, Some(1L))))
    assert(dim(dir).contains((1L, "lima", 1L, None)))
  }

  test("replaying a batch id rewrites, never double-closes") {
    val dir = tmp()
    val b0 = Seq((1L, "oslo")).toDF("pk", "city")
    val b1 = Seq((1L, "lima")).toDF("pk", "city")
    ScdStream.processBatch(b0, 0L, "pk", Seq("city"), dir, false)
    ScdStream.processBatch(b1, 1L, "pk", Seq("city"), dir, false)
    val once = dim(dir)
    ScdStream.processBatch(b1, 1L, "pk", Seq("city"), dir, false)
    assert(dim(dir) == once)
    assert(once == Seq(
      (1L, "oslo", 0L, Some(1L)),
      (1L, "lima", 1L, None)))
  }

  test("compact folds closed history and GCs dead open snapshots; " +
      "reads and later batches unchanged") {
    val a = tmp(); val b = tmp()
    def batch(i: Int, rows: Seq[(Long, String)]): Unit = {
      val df = rows.toDF("pk", "city")
      ScdStream.processBatch(df, i.toLong, "pk", Seq("city"), a, false)
      ScdStream.processBatch(df, i.toLong, "pk", Seq("city"), b, false)
    }
    batch(0, Seq((1L, "oslo"), (2L, "rome")))
    batch(1, Seq((1L, "lima")))
    batch(2, Seq((1L, "kiev"), (2L, "baku")))
    val before = dim(a)
    ScdStream.compact(spark, a)
    assert(dim(a) == before, "compact changed the dimension read")
    val closedDirs = new java.io.File(s"$a/closed").listFiles
      .map(_.getName).sorted.toSeq
    assert(closedDirs.count(_.startsWith("c")) == 1,
      s"closed history not folded: $closedDirs")
    val openDirs = new java.io.File(s"$a/open").listFiles
      .map(_.getName).sorted.toSeq
    assert(openDirs == Seq("b1", "b2"),
      s"open GC must keep exactly the two newest snapshots: $openDirs")
    batch(3, Seq((2L, "cairo")))
    assert(dim(a) == dim(b))
    ScdStream.compact(spark, a)
    assert(dim(a) == dim(b))
  }

  test("dimension() ignores an orphan closed dir from a crashed batch") {
    // Crash window: closed/b2 written, open/b2 NOT — pk 1 would appear
    // both closed (b2) and still open (b1) until the replay completes.
    // dimension() must read the last CONSISTENT state (through b1).
    val dir = tmp()
    val b0 = Seq((1L, "oslo")).toDF("pk", "city")
    val b1 = Seq((1L, "lima")).toDF("pk", "city")
    ScdStream.processBatch(b0, 0L, "pk", Seq("city"), dir, false)
    ScdStream.processBatch(b1, 1L, "pk", Seq("city"), dir, false)
    val consistent = dim(dir)
    // simulate the crash: write ONLY the closed half of batch 2
    Seq((1L, "lima", 1L, Some(2L)))
      .toDF("pk", "city", "valid_from", "valid_to")
      .withColumn("valid_to", col("valid_to").cast("long"))
      .write.parquet(s"$dir/closed/b2")
    assert(dim(dir) == consistent,
      "orphan closed/b2 leaked into the dimension read")
    // completing the replay (open half written) makes b2 visible
    ScdStream.processBatch(Seq((1L, "kiev")).toDF("pk", "city"),
      2L, "pk", Seq("city"), dir, false)
    assert(dim(dir).contains((1L, "kiev", 2L, None)))
    assert(dim(dir).contains((1L, "lima", 1L, Some(2L))))
  }

  test("parts tolerates one compact committing mid-read; two fail loudly") {
    // the dimension() race: the read boundary is derived from open/ at
    // t0, closed/ is listed at t1 — a compact committing in between can
    // make the NEWEST snapshot cover past the boundary. Deferred GC
    // keeps the previous snapshot AND the batch dirs above its cap, so
    // parts must fall back one generation instead of tripping its
    // boundary require; a boundary below the second-newest snapshot is
    // genuinely folded away and must still fail loudly.
    val a = tmp(); val twin = tmp()
    def batch(i: Int, rows: Seq[(Long, String)]): Unit = {
      ScdStream.processBatch(rows.toDF("pk", "city"), i.toLong,
        "pk", Seq("city"), a, false)
      ScdStream.processBatch(rows.toDF("pk", "city"), i.toLong,
        "pk", Seq("city"), twin, false)
    }
    batch(0, Seq((1L, "oslo"), (2L, "rome")))
    batch(1, Seq((1L, "lima")))
    batch(2, Seq((2L, "baku")))
    ScdStream.compact(spark, a) // closed: c0 covering b0..b1
    batch(3, Seq((1L, "kiev")))
    batch(4, Seq((2L, "cairo")))
    ScdStream.compact(spark, a) // closed: c1 covering b2..b3; GC b0,b1
    def closedRows(dir: String, before: Long) =
      StreamState.read(spark, s"$dir/closed", before).get
        .as[(Long, String, Long, Option[Long])]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    // stale boundary 3 (derived before the second compact): the newest
    // snapshot covers 3 — the grace path must serve c0 + b2 instead
    assert(closedRows(a, 3L) == closedRows(twin, 3L),
      "grace read diverged from the uncompacted twin")
    // boundary 1 sits below BOTH snapshots' caps — folded away for real
    val e = intercept[IllegalArgumentException] { closedRows(a, 1L) }
    assert(e.getMessage.contains("compaction must cap"))
    // and the fresh boundary reads normally off the newest snapshot
    assert(closedRows(a, 5L) == closedRows(twin, 5L))
  }

  test("MemoryStream end-to-end matches the batch composition") {
    val dir = tmp()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "oslo"), (2L, "rome"))
    val q = ScdStream.start(input.toDF().toDF("pk", "city"),
      "pk", Seq("city"), dir,
      checkpointLocation = Some(s"$dir/ckpt"))
    q.processAllAvailable()
    input.addData((1L, "lima"))
    q.processAllAvailable()
    q.stop()
    val out = dim(dir)
    assert(out.contains((1L, "lima", 1L, None)))
    assert(out.contains((1L, "oslo", 0L, Some(1L))))
    assert(out.contains((2L, "rome", 0L, None)))
    assert(out.size == 3)
  }

  test("autoCompactEvery: dimension identical to the uncompacted twin " +
      "with folded closed history and GC'd open snapshots") {
    val batches = Seq(Seq((1L, "oslo"), (2L, "rome")), Seq((1L, "lima")),
      Seq((2L, "cairo")), Seq((1L, "quito")))
    def run(dir: String, every: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = ScdStream.start(input.toDF().toDF("pk", "city"),
        "pk", Seq("city"), dir, checkpointLocation = Some(s"$dir/ckpt"),
        autoCompactEvery = every)
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }
    val (a, twin) = (tmp(), tmp())
    run(a, 2); run(twin, 0)
    assert(dim(a) == dim(twin), "dimension diverged under auto-compact")
    val closed = new java.io.File(s"$a/closed").list().toSeq
    assert(closed.exists(_.startsWith("c")), s"no closed snapshot: $closed")
    // latest-wins open slice: superseded snapshots GC'd, not folded
    assert(new java.io.File(s"$a/open").list().count(_.startsWith("b")) <
      new java.io.File(s"$twin/open").list().count(_.startsWith("b")))
  }
}
