package graft.io

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Publish (partitioned parquet layout) and Jsonl (LLM-corpus
  * interchange) round trips on the real documents table. */
class PublishJsonlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("publish writes per-source directories and round-trips exactly") {
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "source", "text")
    val dir = tmp("graft-publish") + "/corpus"
    val n = Publish.writePartitioned(docs, dir, Seq("source"), "doc_id")
    assert(n === docs.count())
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("source="))
    assert(dirs.length === docs.select("source").distinct().count())
    val back = Publish.readPartitioned(spark, dir)
    assert(back.count() === n)
    // same rows, partition column recovered from directory names
    val a = docs.as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val b = back.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(b === a)
  }

  test("publish partition filter prunes to one directory's files") {
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "source", "text")
    val dir = tmp("graft-publish-prune") + "/corpus"
    Publish.writePartitioned(docs, dir, Seq("source"), "doc_id")
    val one = docs.select("source").as[String].head()
    val pruned = Publish.readPartitioned(spark, dir)
      .filter(col("source") === one)
    val expected = docs.filter(col("source") === one).count()
    assert(pruned.count() === expected)
    val scheme = pruned.queryExecution.executedPlan.toString()
    assert(scheme.contains("PartitionFilters: [isnotnull(source"),
      "partition filter must prune directories, not rows:\n" + scheme)
  }

  test("jsonl round-trips with an explicit schema, no corrupt rows") {
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text", "lang", "source")
    val dir = tmp("graft-jsonl") + "/docs"
    Jsonl.write(docs, dir)
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("lang", StringType).add("source", StringType)
    // cache before touching _corrupt_record alone — Spark disallows
    // corrupt-column-only queries straight off raw files
    val back = Jsonl.read(spark, dir, schema).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() === 0)
    val a = docs.as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
    val b = back.select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
    assert(b === a)
  }

  test("jsonl read surfaces corrupt lines instead of silently dropping") {
    val dir = tmp("graft-jsonl-bad")
    Seq("""{"doc_id": 1, "text": "ok"}""", """not json at all""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir + "/in")
    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
    val back = Jsonl.read(spark, dir + "/in", schema).cache()
    assert(back.count() === 2)
    assert(back.filter(col("_corrupt_record").isNotNull).count() === 1)
    val strict = Jsonl.read(spark, dir + "/in", schema, permissive = false)
    assert(strict.count() === 1)
  }
}
