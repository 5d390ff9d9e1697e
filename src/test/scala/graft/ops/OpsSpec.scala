package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class CoercionSpec extends SparkSpec {
  import spark.implicits._

  test("emptyStringAsNull: blank → NULL, others pass through") {
    val df = Seq("", "  ", "x", " y ").toDF("v")
      .select(Coercion.emptyStringAsNull(col("v")).as("v"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, None, Some("x"), Some(" y ")))
  }

  test("boolish truth set matches the reference (lwetl/jdbc.py:332-334)") {
    val in = Seq("true", "1", "YES", " si ", "y", "S", "no", "0", "false", "anything")
    val got = in.toDF("v").select(Coercion.boolish(col("v")).as("b"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true, true, true, true, true, false, false, false, false))
  }

  test("boolish of NULL is NULL") {
    val got = Seq(Option.empty[String]).toDF("v")
      .select(Coercion.boolish(col("v")).as("b")).collect().head
    assert(got.isNullAt(0))
  }

  test("strptime translation covers the reference's format atoms") {
    assert(Coercion.strptimeToJava("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(Coercion.strptimeToJava("%d/%m/%y") == "dd/MM/yy")
  }

  test("cast-DSL: single spec projects first column as scalar") {
    val df = Seq(("5", "x"), ("7", "y")).toDF("a", "b")
    val out = Coercion.applyCastSpecs(df, Seq("int"))
    assert(out.columns.toSeq == Seq("a"))
    assert(out.as[Long].collect().toSeq == Seq(5L, 7L))
  }

  test("cast-DSL: positional specs with 'any' padding") {
    val df = Seq(("5", "2020-01-02", "yes", "zz")).toDF("a", "b", "c", "d")
    val out = Coercion.applyCastSpecs(df, Seq("int", "date", "bool"))
    val r = out.collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getTimestamp(1).toString.startsWith("2020-01-02"))
    assert(r.getBoolean(2))
    assert(r.getString(3) == "zz") // padded with 'any'
  }

  test("property: boolish(s) == reference truth-set membership (100 generated)") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf(Coercion.TrueStrings),
      Gen.oneOf(Coercion.TrueStrings).map(s => s"  ${s.toUpperCase} "))
    val samples = Gen.listOfN(100, gen).apply(Gen.Parameters.default, Seed(42L)).get
    val got = samples.toDF("v")
      .select(col("v"), Coercion.boolish(col("v")).as("b")).collect()
    got.foreach { r =>
      val s = r.getString(0)
      assert(r.getBoolean(1) == Coercion.TrueStrings.contains(s.trim.toLowerCase),
        s"for input '$s'")
    }
  }
}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("upperCaseColumns") {
    val df = Seq((1, 2)).toDF("a_b", "cD")
    assert(Relational.upperCaseColumns(df).columns.toSeq == Seq("A_B", "CD"))
  }

  test("newRows / existingRows / orphans mirror db-copy set logic") {
    val src = Seq((1, "a"), (2, "b"), (3, "c")).toDF("pk", "v")
    val trg = Seq((2, "x"), (4, "y")).toDF("pk", "v")
    assert(Relational.newRows(src, trg, "pk").select("pk").as[Int].collect().toSet == Set(1, 3))
    assert(Relational.existingRows(src, trg, "pk").select("pk").as[Int].collect().toSet == Set(2))
    assert(Relational.orphans(src, trg, "pk").select("pk").as[Int].collect().toSet == Set(4))
  }

  test("profileCardinality: non-null, >1, count-desc then value") {
    val df = Seq("a", "a", "b", "b", "b", "c", null).map(Tuple1(_)).toDF("v")
    val got = Relational.profileCardinality(df, "v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("b", 3L), ("a", 2L)))
  }

  test("rowChecksum skips nulls like the reference's list-comprehension") {
    val df = Seq((Some("a"), Some("b")), (Some("a"), None)).toDF("x", "y")
    val got = Relational.rowChecksum(df, Seq("x", "y")).select("row_md5")
      .as[String].collect()
    // md5("a;b") vs md5("a") — null dropped, not rendered
    assert(got(0) == org.apache.commons.codec.digest.DigestUtils.md5Hex("a;b"))
    assert(got(1) == org.apache.commons.codec.digest.DigestUtils.md5Hex("a"))
  }

  test("scalar scans: querySingle / querySingleValue / getInt") {
    val df = Seq((42L, "x")).toDF("n", "s")
    assert(Relational.querySingle(df).get.getLong(0) == 42L)
    assert(Relational.querySingleValue(df).contains(42L))
    assert(Relational.getInt(df) == 42L)
    assert(Relational.getInt(df.filter("n < 0"), default = -1L) == -1L)
    assert(Relational.getInt(Seq(("7.9", 1)).toDF("s", "i")) == 7L)
  }

  test("asofJoinBackward equals the naive join+argmax result") {
    val left = Seq((1, 10, 100L), (1, 20, 101L), (2, 15, 102L), (3, 5, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1, 5, 200L), (1, 10, 201L), (1, 18, 202L), (2, 99, 203L))
      .toDF("k", "t", "rid")
    val got = Relational.asofJoinBackward(left, right, "k", "t", "t", "rid", "asof")
      .select("lid", "asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // lid=100 (k1,t10): rights t∈{5,10} → max(t,id) = (10,201)
    // lid=101 (k1,t20): rights t∈{5,10,18} → 202
    // lid=102 (k2,t15): right t=99 is after → none
    // lid=103 (k3): no rights → none
    assert(got == Map(100L -> Some(201L), 101L -> Some(202L),
      102L -> None, 103L -> None))
  }
}
