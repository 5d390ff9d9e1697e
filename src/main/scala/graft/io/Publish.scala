package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The PUBLISH step — writing a curated corpus as a consumable
  * dataset. Getting the physical layout right is a scale concern the
  * transforms upstream can't fix after the fact:
  *
  *  - `partitionBy` on low-cardinality columns (source, split) gives
  *    readers partition PRUNING — a training run over one split reads
  *    none of the others' bytes;
  *  - rows are range-repartitioned on (partition cols + sort key)
  *    BEFORE the write, so each output partition's data lands in few
  *    tasks instead of every task writing a sliver into every
  *    partition directory (the classic small-files explosion: T tasks
  *    × P partitions = T×P files);
  *  - `sortWithinPartitions` on the sort key clusters parquet row
  *    groups so min/max stats prune id-range scans;
  *  - `maxRecordsPerFile` bounds file size from above; the range
  *    repartition bounds the file COUNT from below (≈ one run of
  *    files per partition value).
  */
object Publish {

  /** Write `df` under `outDir` partitioned by `partitionCols`, rows
    * clustered by `sortCol` within files, at most `maxRecordsPerFile`
    * rows per file. Returns the written row count (one extra scan of
    * the written data — cheap, and the publish step is exactly where
    * a pipeline wants a durable row-count check). */
  def writePartitioned(df: DataFrame, outDir: String,
                       partitionCols: Seq[String], sortCol: String,
                       maxRecordsPerFile: Long = 5000000L): Long = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val keys = (partitionCols :+ sortCol).map(col)
    df.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(outDir)
    // an all-empty frame writes NO parquet files (only _SUCCESS) —
    // the read-back count would die on schema inference; report the
    // zero without reading so callers can act on it (the prep chain
    // skips fileless links). "Data file" = any non-hidden name (not
    // '_'/'.'-prefixed — Hadoop's hidden-file convention), NOT a
    // '.parquet' suffix match: a committer or naming scheme that
    // drops the suffix must not make a real write report 0 rows (and,
    // downstream, silently drop the chain link).
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var hasData = false
    while (!hasData && it.hasNext) {
      val n = it.next().getPath.getName
      hasData = !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasData) 0L else df.sparkSession.read.parquet(outDir).count()
  }

  /** Read a published dataset back. Partition-column values come from
    * directory names (Spark partition discovery); pushing a filter on
    * them prunes directories before any file is opened. */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
