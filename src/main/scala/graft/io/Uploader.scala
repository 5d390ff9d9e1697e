package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Upload facade over the DML renderers — the reference's uploader
  * lifecycle (`lwetl/uploader.py`) mapped to Spark semantics.
  *
  * Commit modes (`lwetl/uploader.py:22-25`):
  *   - dryrun  → render nothing, return counts only
  *   - pipe    → emit the SQL text stream (the reference pipes to a
  *               Formatter; here you get the Dataset and point it at any
  *               sink) — trivially distributed
  *   - commit  → execute against the target (per-partition batches; no
  *               global transaction — Spark's model, documented)
  *   - rollback → NOT SUPPORTED distributed: there is no global txn to
  *               roll back; fails fast with a clear error (SURVEY §7.4.5)
  */
object Uploader {

  sealed trait CommitMode
  case object DryRun extends CommitMode
  case object Pipe extends CommitMode
  case object Commit extends CommitMode
  case object Rollback extends CommitMode

  def mode(name: String): CommitMode = name.toLowerCase match {
    case "dryrun" => DryRun
    case "pipe" => Pipe
    case "commit" => Commit
    case "rollback" => Rollback
    case other => throw new IllegalArgumentException(s"unknown commit mode: $other")
  }

  /** Outcome of an upload call: row count + the SQL stream when piped. */
  case class Result(rows: Long, sql: Option[DataFrame])

  def insert(df: DataFrame, table: String, cm: CommitMode,
             dialect: SqlRender.Dialect = SqlRender.Ansi,
             execute: DataFrame => Unit = _ => ()): Result = cm match {
    case DryRun => Result(df.count(), None)
    case Pipe => Result(-1L, Some(SqlRender.insertStatements(df, table, dialect)))
    case Commit =>
      execute(df); Result(df.count(), None)
    case Rollback =>
      throw new UnsupportedOperationException(
        "rollback mode has no distributed equivalent: use dryrun/pipe, " +
          "or wrap the target sink in a transactional table format")
  }

  def update(df: DataFrame, table: String, keyCols: Seq[String], cm: CommitMode,
             dialect: SqlRender.Dialect = SqlRender.Ansi): Result = cm match {
    case DryRun => Result(df.count(), None)
    case Pipe => Result(-1L, Some(SqlRender.updateStatements(df, table, keyCols, dialect)))
    case _ => throw new UnsupportedOperationException(
      "distributed UPDATE requires a transactional sink; use pipe mode " +
        "to emit statements for the target database")
  }

  def delete(df: DataFrame, table: String, keyCols: Seq[String], cm: CommitMode,
             dialect: SqlRender.Dialect = SqlRender.Ansi): Result = cm match {
    case DryRun => Result(df.count(), None)
    case Pipe => Result(-1L, Some(SqlRender.deleteStatements(df, table, keyCols, dialect)))
    case _ => throw new UnsupportedOperationException(
      "distributed DELETE requires a transactional sink; use pipe mode")
  }

  /** PK-counter replacement (`lwetl/uploader.py:31-61` PK_COUNTERS):
    * the reference probes max(pk) once and increments client-side; the
    * distributed equivalent assigns base + rank over an explicit order.
    * Unlike the reference there is NO cross-job monotonicity — two
    * concurrent writers can collide, same as two lwetl processes
    * (SURVEY §7.4.4 documents the semantic difference).
    *
    * Scale shape: a `Window.orderBy` with no partitionBy would pull
    * EVERY row through one task. Instead: range-partitioned total sort
    * (parallel — only the partition boundaries are sampled centrally),
    * then zipWithIndex assigns contiguous ids from per-partition counts
    * (one lightweight count pass, no data movement). */
  def assignPk(df: DataFrame, pkCol: String, base: Long,
               orderBy: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val body = if (df.columns.contains(pkCol)) df.drop(pkCol) else df
    val sorted = body.orderBy(orderBy.map(col): _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(pkCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (base + i + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** Probe the current max of a PK column (0 when empty/all-null),
    * mirroring `get_pk_counter`. */
  def pkBase(df: DataFrame, pkCol: String): Long = {
    val r = df.agg(max(col(pkCol).cast("long"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Execute a one-column "stmt" frame against a live JDBC target: one
    * connection per partition, statements batched `batchSize` at a time —
    * the distributed execution of the pipe-mode DML stream (the
    * reference's per-row `uploader.update`/chunked DELETE loop,
    * `lwetl/uploader.py:412-435`, `db_copy/main.py:362-380`).
    *
    * Each batch is its own transaction, and a batch that dies with a
    * transient serialization/deadlock state (SQLState 40xxx — two
    * partitions updating rows on the same page in opposite orders WILL
    * deadlock eventually) rolls back and retries with backoff; callers
    * should also range-partition the statements by key so concurrent
    * transactions touch disjoint page ranges (see DbCopy.applyJdbc).
    * Returns the number of statements executed (accumulator — the frame
    * is evaluated exactly once). */
  def executeJdbc(stmts: DataFrame, r: Config.Resolved,
                  batchSize: Int = 500, maxRetries: Int = 5): Long = {
    val acc = stmts.sparkSession.sparkContext.longAccumulator("graft.dml")
    val resolved = r
    stmts.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(
          resolved.url, Config.connectionProps(resolved))
        try {
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          def transient(e: java.sql.SQLException): Boolean = {
            // batch failures chain one exception PER STATEMENT on some
            // drivers — walk the whole next-exception chain (bounded
            // well past any batch size) and the cause chain too
            val nexts = Iterator.iterate(e)(_.getNextException)
              .takeWhile(_ != null).take(2 * 500 + 10)
            val causes = Iterator.iterate(e: Throwable)(_.getCause)
              .takeWhile(_ != null).take(20)
              .collect { case sq: java.sql.SQLException => sq }
            (nexts ++ causes).exists(x =>
              Option(x.getSQLState).exists(_.startsWith("40")))
          }
          def flush(): Unit = if (buf.nonEmpty) {
            var attempt = 0
            var done = false
            while (!done) {
              try {
                buf.foreach(st.addBatch)
                val n = st.executeBatch().length.toLong
                conn.commit()
                acc.add(n)
                done = true
              } catch {
                case e: java.sql.SQLException if attempt < maxRetries && transient(e) =>
                  conn.rollback(); st.clearBatch()
                  attempt += 1
                  Thread.sleep(25L << attempt)
                case e: Throwable =>
                  // a dead connection makes rollback itself throw —
                  // never let that mask the root cause
                  scala.util.Try(conn.rollback())
                  throw e
              }
            }
            buf.clear()
          }
          rows.foreach { row =>
            buf += row.getString(0)
            if (buf.size >= batchSize) flush()
          }
          flush()
          st.close()
        } finally conn.close()
      }
    }
    acc.value
  }
}
