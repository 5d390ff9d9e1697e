package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantize — SQ8 params/codes/dequant and ADC ranking on hand-sized
  * vectors. q100/q101 pin the full corpus against DuckDB. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  // dim0 spans [0,8], dim1 spans [-1,1], dim2 constant
  private val vecs = Seq(
    (0L, Seq(0.0f, -1.0f, 5.0f)),
    (1L, Seq(8.0f, 1.0f, 5.0f)),
    (2L, Seq(4.0f, 0.0f, 5.0f)),
    (3L, Seq(2.0f, 0.5f, 5.0f))).toDF("id", "vec")

  test("sq8Params: per-dimension min/max in dimension order") {
    val p = Quantize.sq8Params(vecs, "vec")
      .as[(Seq[Double], Seq[Double])].collect().head
    assert(p == ((Seq(0.0, -1.0, 5.0), Seq(8.0, 1.0, 5.0))))
  }

  test("codes: floor scaling, max clamps to 255, constant dim is 0") {
    val codes = Quantize.withSq8Codes(vecs, "vec",
        Quantize.sq8Params(vecs, "vec"))
      .select(col("id"), col("codes")).as[(Long, Seq[Int])]
      .collect().sortBy(_._1).toMap
    assert(codes(0L) == Seq(0, 0, 0))        // mins → code 0
    assert(codes(1L) == Seq(255, 255, 0))    // maxs → clamp 255
    assert(codes(2L) == Seq(128, 128, 0))    // midpoint → 128
    assert(codes(3L) == Seq(64, 192, 0))     // quarter / three-quarter
  }

  test("adcTopK: ranks by dequantized squared-L2, probe excluded") {
    val out = Quantize.adcTopK(vecs, "id", "vec", probeId = 0L, k = 3)
      .as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(3L, 2L, 1L))
    // closed form for id=2: dim0 code 128 → dequant 0 + 128.5*8/256
    //   = 4.015625; dim1 code 128 → -1 + 128.5*2/256 = 0.00390625;
    //   dim2 exact 5. dist vs probe (0,-1,5):
    val d0 = 4.015625 * 4.015625
    val d1 = (0.00390625 - -1.0) * (0.00390625 - -1.0)
    val exp = BigDecimal(d0 + d1).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.find(_._1 == 2L).get._2 == exp)
  }

  test("ivfAdcTopK with nprobe = #cells equals brute-force adcTopK") {
    val blocked = vecs.withColumn("blk", (col("id") % 2).cast("int"))
    val brute = Quantize.adcTopK(blocked, "id", "vec", 0L, 3)
      .as[(Long, Double)].collect().toSeq
    val ivf = Quantize.ivfAdcTopK(blocked, "id", "vec", "blk", 0L,
        nprobe = 2, k = 3)
      .as[(Long, Double)].collect().toSeq
    assert(ivf == brute)
  }

  test("ivfAdcTopK probes only the selected cells") {
    val blocked = vecs.withColumn("blk", (col("id") % 2).cast("int"))
    // probe 0 sits in cell 0 with id 2; nprobe=1 must pick ONE cell —
    // whichever it is, results come from a single blk value
    val out = Quantize.ivfAdcTopK(blocked, "id", "vec", "blk", 0L,
        nprobe = 1, k = 4)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(out == Set(2L) || out == Set(1L, 3L),
      s"results must come from exactly one cell, got $out")
  }

  test("ivfAdcTopKBatch at nprobe = #cells equals per-probe adcTopK") {
    val blocked = vecs.withColumn("blk", (col("id") % 2).cast("int"))
    val batch = Quantize.ivfAdcTopKBatch(blocked,
        blocked.filter(col("id") <= 1), "id", "vec", "blk",
        nprobe = 2, k = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    for (pid <- Seq(0L, 1L)) {
      val brute = Quantize.adcTopK(blocked, "id", "vec", pid, 2)
        .as[(Long, Double)].collect().toSeq
      val got = batch.filter(_._1 == pid).sortBy(_._2)
        .map(t => (t._3, t._4))
      assert(got == brute, s"probe $pid")
    }
  }

  test("adcRecallBatch counts ADC∩exact per probe (hand-checked)") {
    // probe 0: exact top-2 {3, 2}; ADC top-2 {3, 2} → 2
    // probe 1: exact top-2 {2, 3}; ADC top-2 {2, 3} → 2
    val out = Quantize.adcRecallBatch(vecs,
        vecs.filter(col("id") <= 1), "id", "vec", k = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 2L), (1L, 2L)))
  }

  test("params artifact: save/load round trip codes identically") {
    val dir = java.nio.file.Files.createTempDirectory("sq8p").toString
    val params = Quantize.sq8Params(vecs, "vec")
    Quantize.saveParams(params, s"$dir/params")
    val loaded = Quantize.loadParams(spark, s"$dir/params")
    val a = Quantize.withSq8Codes(vecs, "vec", params)
      .select(col("id"), col("codes")).as[(Long, Seq[Int])].collect().toSet
    val b = Quantize.withSq8Codes(vecs, "vec", loaded)
      .select(col("id"), col("codes")).as[(Long, Seq[Int])].collect().toSet
    assert(a == b)
    // frozen ranges: a NEW batch outside the trained range still codes
    // (clamped BOTH sides), so cross-batch codes stay comparable
    val batch = Seq((9L, Seq(-5.0f, 2.0f, 5.0f))).toDF("id", "vec")
    val c = Quantize.withSq8Codes(batch, "vec", loaded)
      .select(col("codes")).as[Seq[Int]].collect().head
    assert(c == Seq(0, 255, 0))
  }

  test("loadParams rejects non-artifact inputs") {
    val dir = java.nio.file.Files.createTempDirectory("sq8bad").toString
    vecs.write.mode("overwrite").parquet(s"$dir/notparams")
    intercept[IllegalArgumentException] {
      Quantize.loadParams(spark, s"$dir/notparams")
    }
  }

  test("adc distance of a vector against its own codes is small") {
    // reconstruction error ≤ half a cell per dim: for id=3 the probe
    // itself is excluded, so check via id ordering only — nearest to
    // probe 0 must be 3 (distance ~4.3) not 1 (~68)
    val out = Quantize.adcTopK(vecs, "id", "vec", probeId = 0L, k = 1)
      .as[(Long, Double)].collect().head
    assert(out._1 == 3L && out._2 < 10.0)
  }
}
