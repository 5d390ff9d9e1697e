package graft.io

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** lwetl LdifImport semantics (`lwetl/table_import.py:222-375`) as a
  * distributed reader.
  *
  * Records are blank-line separated, so `spark.read.option("lineSep",
  * "\n\n")` yields ONE ROW PER RECORD straight off the splittable text
  * source — record parsing then runs in parallel per partition with no
  * shuffle. Within a record:
  *
  *   - `attr: value` lines; leading space/tab continues the previous value
  *   - `attr:: value` is base64; decoded, then UTF-8-decoded when valid
  *     (invalid UTF-8 — e.g. an embedded JPEG — stays base64 text here;
  *     pull real bytes with [[binaryColumn]])
  *   - repeated attrs → ArrayType column (or `separator`-joined when a
  *     separator is given), scalar otherwise — decided by one distributed
  *     aggregation over observed multiplicities
  */
object LdifImport {

  private val AttrLine = "^([A-Za-z]+[0-9A-Za-z\\-]*)(:{1,2})(.*)$".r

  /** Parse one record chunk into attr → values (ordered, repeats kept). */
  private[io] def parseRecord(chunk: String): Seq[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var attr: String = null
    var value = new StringBuilder
    var isB64 = false

    def flush(): Unit = {
      if (attr != null && value.nonEmpty) {
        val v =
          if (isB64) {
            try {
              val bytes = Base64.getDecoder.decode(value.result().replaceAll("\\s", ""))
              val dec = StandardCharsets.UTF_8.newDecoder()
              try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
              catch { case _: java.nio.charset.CharacterCodingException =>
                value.result() // non-text payload: keep the base64 form
              }
            } catch { case _: IllegalArgumentException => "" }
          } else value.result()
        if (v.nonEmpty) out += attr -> v
      }
      attr = null; value = new StringBuilder; isB64 = false
    }

    chunk.split("\r?\n", -1).foreach { line =>
      if (line.trim.isEmpty) ()
      else if ((line.head == ' ' || line.head == '\t') && attr != null)
        value.append(line.replaceAll("\\s+$", "").drop(1))
      else line match {
        case AttrLine(a, sep, v) =>
          flush()
          attr = a
          value = new StringBuilder(v.trim)
          isB64 = sep.length > 1
        case _ => ()
      }
    }
    flush()
    out.result()
  }

  /** Raw record stream: one row per record, attrs exploded as
    * (record_id, attr, values: Seq[String]). */
  def readRecords(spark: SparkSession, path: String): Dataset[(Long, Seq[(String, Seq[String])])] = {
    import spark.implicits._
    spark.read.option("lineSep", "\n\n").text(path)
      .select(col("value"))
      .as[String]
      .filter((s: String) => s.trim.nonEmpty)
      .map { chunk =>
        val pairs = parseRecord(chunk)
        pairs.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
          .sortBy { case (a, _) => pairs.indexWhere(_._1 == a) }
      }
      .rdd.zipWithIndex().map(_.swap)
      .toDS()
  }

  /** Read as a DataFrame: one column per attribute. Attributes that
    * repeat in ANY record become ArrayType(String) (or separator-joined
    * strings), scalars otherwise. */
  def read(spark: SparkSession, path: String,
           separator: Option[String] = None): DataFrame = {
    import spark.implicits._
    val recs = readRecords(spark, path).cache()
    try {
      // schema pass: each attr's max multiplicity + first-seen order
      val attrInfo = recs.flatMap { case (rid, pairs) =>
        pairs.zipWithIndex.map { case ((a, vs), pos) => (a, vs.length, rid, pos) }
      }.toDF("attr", "mult", "rid", "pos")
        .groupBy("attr")
        .agg(max(col("mult")).cast("long").as("max_mult"),
          min(struct(col("rid"), col("pos"))).as("first_seen"))
        .orderBy("first_seen")
        .collect()

      val attrs = attrInfo.map(r => r.getString(0) -> (r.getLong(1) > 1L))

      val rows = recs.map { case (rid, pairs) =>
        (rid, pairs.toMap)
      }.toDF("_rid", "m")

      val cols = attrs.map { case (a, isMulti) =>
        val values = col("m").getItem(a)
        if (isMulti) separator match {
          case Some(sep) => concat_ws(sep, values).as(a)
          case None => values.as(a)
        }
        else values.getItem(0).as(a)
      }
      rows.select((col("_rid") +: cols.toIndexedSeq): _*)
        .orderBy("_rid").drop("_rid")
    } finally recs.unpersist()
  }

  /** Decode one (scalar) attribute back to raw bytes — the reference's
    * photo/BLOB path (`tests/test.py:186-192` uploads the LDIF photo as
    * binary). Works on values [[read]] left base64-encoded. */
  def binaryColumn(df: DataFrame, attr: String): DataFrame =
    df.withColumn(attr, unbase64(regexp_replace(col(attr), "\\s", "")))
}
