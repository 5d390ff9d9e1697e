package graft.apps

import graft.SparkSpec
import graft.io.{Sinks, SqlRender}
import org.apache.spark.sql.functions._

class IntrospectSpec extends SparkSpec {

  test("tables/columns/tableCounts over registered views") {
    graft.Tables.registerAll(spark, sf())
    val ts = Introspect.tables(spark).collect().map(_.getString(0)).toSet
    assert(graft.Tables.all.toSet.subsetOf(ts))
    val cols = Introspect.columns(spark, "nation").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(cols("n_nationkey") == "int" && cols("n_name") == "string")
    val counts = Introspect.tableCounts(spark, Seq("region", "nation"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts == Map("region" -> 5L, "nation" -> 25L))
  }

  test("info reports engine versions") {
    val m = Introspect.info(spark).toMap
    assert(m("spark.version").startsWith("4."))
    assert(m("scala.version").startsWith("2.13"))
  }
}

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("extractBinaries writes payloads named by column") {
    val dir = java.nio.file.Files.createTempDirectory("graft").toString
    val df = Seq(("a.bin", Array[Byte](1, 2)), ("b.bin", Array[Byte](3)))
      .toDF("name", "data")
    Sinks.extractBinaries(df, "name", "data", dir)
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "a.bin")).toSeq == Seq[Byte](1, 2))
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "b.bin")).toSeq == Seq[Byte](3))
  }

  test("insertStatements rawValues pass through verbatim (NativeExpression)") {
    val df = Seq((1, "x")).toDF("ID", "V")
    val s = SqlRender.insertStatements(df, "T",
        rawValues = Map("created" -> "SYSDATE", "seq" -> "SEQ.NEXTVAL"))
      .as[String].collect().head
    assert(s == "INSERT INTO T (ID,V,CREATED,SEQ) VALUES (1,'x',SYSDATE,SEQ.NEXTVAL)")
  }
}
