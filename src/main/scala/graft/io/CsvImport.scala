package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** lwetl CsvImport semantics (`lwetl/table_import.py:120-219`) on top of
  * Spark's distributed CSV reader:
  *
  *   - TAB default delimiter, header row defines columns
  *   - header names normalized via [[Naming.uniqueColumnName]]
  *   - rows may be WIDER than the header: extra fields land in generated
  *     `C<n>` columns (the reference grows the schema mid-stream; Spark
  *     plans have a fixed schema, so the width is discovered in a cheap
  *     first pass over the raw text — one distributed max())
  *   - empty values become NULL; all-empty rows are dropped
  *
  * All values stay strings, like the reference's dict rows — downstream
  * coercion is `ops.Coercion`/cast-DSL territory.
  */
object CsvImport {

  def read(spark: SparkSession, path: String, delimiter: String = "\t",
           encoding: String = "utf-8"): DataFrame = {
    // header: first line, read driver-side (one line of one file)
    val src = scala.io.Source.fromFile(path, encoding)
    val headerLine =
      try src.getLines().nextOption().getOrElse(
        throw new IllegalArgumentException(s"No data found for: '$path'"))
      finally src.close()
    val headerCells = splitCsvLine(headerLine, delimiter.head)
    val headerNames = Naming.uniqueColumnNames(headerCells)

    // pass 1: widest row (quoted fields blanked before counting so an
    // embedded delimiter inside quotes doesn't inflate the count)
    val sepCount = spark.read.text(path)
      .select(max(size(split(
        regexp_replace(col("value"), "\"([^\"]|\"\")*\"", ""),
        java.util.regex.Pattern.quote(delimiter)))).as("n"))
      .head().getInt(0)
    val nCols = math.max(headerNames.length, sepCount)

    val allNames = (headerNames.length until nCols)
      .foldLeft(headerNames)((acc, _) => acc :+ Naming.uniqueColumnName(null, acc))
    val schema = StructType(allNames.map(n => StructField(n, StringType)))

    val df = spark.read
      .option("header", "true") // skip the first line of each file
      .option("sep", delimiter)
      .option("encoding", encoding)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

    // empty ≡ NULL (lwetl is_empty); drop rows with no values at all
    val nulled = df.select(allNames.map(n =>
      when(trim(col(n)) === "", lit(null)).otherwise(col(n)).as(n)): _*)
    nulled.na.drop("all")
  }

  /** Minimal RFC-4180-ish single-line field splitter (for the header
    * line only; data rows go through Spark's CSV parser). */
  private[io] def splitCsvLine(line: String, sep: Char): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQ) {
        if (ch == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else if (ch == '"') inQ = false
        else cur.append(ch)
      } else {
        if (ch == '"') inQ = true
        else if (ch == sep) { out += cur.result(); cur.clear() }
        else cur.append(ch)
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }
}
