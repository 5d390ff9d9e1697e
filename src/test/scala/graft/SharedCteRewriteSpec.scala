package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-side CTE materialization rewrite must hint exactly the
  * shared CTE definitions — and nothing that merely LOOKS like one: a
  * `WINDOW w AS (...)` clause or a recursive member's column list
  * matched the old line-anchored regex; the positional parse excludes
  * both by construction (depth-0, before the first top-level SELECT). */
class SharedCteRewriteSpec extends AnyFunSuite {

  private def rw(sql: String): String = SparkEntry.materializeSharedCtes(sql)

  test("a CTE referenced twice is materialized; a single-use one is not") {
    val sql = """WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a)
       SELECT * FROM a JOIN b USING (x)"""
    val out = rw(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1"))
    assert(out.contains("b AS (SELECT x FROM a)"), "single-use b must stay plain")
  }

  test("a WINDOW clause inside a CTE body is never rewritten, even when " +
      "its name collides with reference counting") {
    // `w` appears 3 times (definition + two OVER w) — the old regex
    // rewrote the WINDOW definition into invalid SQL
    val sql = """WITH a AS (
         SELECT x, sum(x) OVER w AS s, avg(x) OVER w AS m
         FROM t WINDOW w AS (ORDER BY x))
       SELECT * FROM a JOIN a a2 USING (x)"""
    val out = rw(sql)
    assert(out.contains("WINDOW w AS (ORDER BY x)"),
      s"WINDOW definition corrupted:\n$out")
    assert(out.contains("a AS MATERIALIZED ("), "the real shared CTE still hints")
  }

  test("a top-level WINDOW clause (after the final SELECT) is untouched") {
    val sql = """WITH a AS (SELECT 1 AS x)
       SELECT x, count(*) OVER w FROM a JOIN a a2 USING (x)
       WINDOW w AS (PARTITION BY x)"""
    val out = rw(sql)
    assert(out.contains("WINDOW w AS (PARTITION BY x)"))
  }

  test("recursive members (column-list definitions) stay un-hinted") {
    val sql = """WITH RECURSIVE reach(id, label) AS (
         SELECT id, id FROM nodes
         UNION SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id)
       SELECT label FROM reach JOIN reach r2 USING (id)"""
    val out = rw(sql)
    assert(!out.contains("MATERIALIZED"),
      s"recursive CTE must never be hinted (DuckDB rejects it):\n$out")
  }

  test("parens inside string literals do not confuse the depth walk") {
    val sql = """WITH a AS (SELECT regexp_replace(x, '([a-z])', '\1') AS x FROM t)
       SELECT * FROM a JOIN a a2 USING (x)"""
    val out = rw(sql)
    assert(out.contains("a AS MATERIALIZED ("),
      s"literal parens broke the parse:\n$out")
  }
}
