package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate siblings of the exact cardinality/percentile operators
  * (Relational.profileCardinality / countDistinct / percentile) — the
  * 100 TB defaults the exact forms' docs point to.
  *
  * Error contracts (both are DETERMINISTIC for a given input — no seed,
  * so they are gate-hashable through the comparison frames below):
  *
  *   - [[approxCardinality]]: Spark's HyperLogLog++ with relative
  *     standard deviation `rsd` (default 0.05). The observed relative
  *     error is within 3·rsd with ~99.7% probability; one map pass +
  *     one tiny sketch merge, no shuffle of the data itself, constant
  *     memory per column — vs exact countDistinct, which shuffles every
  *     distinct value.
  *   - [[approxPercentiles]]: Greenwald-Khanna (approx_percentile) with
  *     rank error ≤ 1/`accuracy` (default 1e-4): the returned value's
  *     RANK is within n/accuracy positions of the true percentile rank.
  *     Bounded-size summaries merge tree-wise — no sort, no shuffle of
  *     the value column — vs exact percentile, which collects all
  *     values per group.
  *
  * The `...Check` variants compute BOTH forms and flag whether the
  * approximation met a caller-supplied relative-error tolerance: that
  * makes the probabilistic contract itself a value-level gate (the SQL
  * oracle produces the exact numbers and literal TRUE flags — the hash
  * matches iff the bound held).
  */
object Approx {

  /** Approximate distinct count per column, one output row:
    * `<col>_approx` for each input column. */
  def approxCardinality(df: DataFrame, cols: Seq[String],
                        rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"${cols.head}_approx"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_approx")): _*)

  /** Exact + approximate distinct counts with a per-column bound flag:
    * `<col>` (exact), `<col>_ok` (relative error ≤ tol). */
  def approxCardinalityCheck(df: DataFrame, cols: Seq[String],
                             rsd: Double = 0.05,
                             tol: Double = 0.15): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(countDistinct(col(c)).as(c),
        approx_count_distinct(col(c), rsd).as(s"_a_$c"))
    }
    val flags = cols.map { c =>
      // zero-distinct column (empty/all-NULL input): 0/0 is NaN, which
      // would fail the <= and flag a PERFECT approximation as broken —
      // equality is the bound when the denominator vanishes
      when(col(c) === 0, col(s"_a_$c") === 0)
        .otherwise(abs(col(s"_a_$c") - col(c)).cast("double") / col(c) <= tol)
        .as(s"${c}_ok")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(cols.map(col) ++ flags: _*)
  }

  /** Approximate percentiles of `valueCol`, one output row:
    * `p<pct>_approx` per requested probability. */
  def approxPercentiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                        accuracy: Int = 10000): DataFrame =
    df.agg(
      pName(probs.head, "_approx")(
        approx_percentile(col(valueCol), lit(probs.head), lit(accuracy))),
      probs.tail.map(p => pName(p, "_approx")(
        approx_percentile(col(valueCol), lit(p), lit(accuracy)))): _*)

  /** Exact + approximate percentiles with a bound flag per probability:
    * `p<pct>` (exact, rounded to 4), `p<pct>_ok` (relative value error
    * ≤ tol). accuracy=1e4 bounds RANK error at 1e-4, which on any
    * non-degenerate value distribution lands far inside a 1% value
    * tolerance. */
  def approxPercentilesCheck(df: DataFrame, valueCol: String,
                             probs: Seq[Double], accuracy: Int = 10000,
                             tol: Double = 0.01): DataFrame = {
    val aggs = probs.flatMap { p =>
      Seq(pName(p, "")(expr(s"percentile($valueCol, $p)")),
        pName(p, "_a")(approx_percentile(col(valueCol), lit(p), lit(accuracy))))
    }
    val out = probs.flatMap { p =>
      val (e, a) = (s"p${pct(p)}", s"p${pct(p)}_a")
      // empty input → both NULL (a met contract); exact 0 → relative
      // error is undefined, fall back to an absolute-tolerance check
      val ok =
        when(col(e).isNull, col(a).isNull)
          .when(col(e) === 0, abs(col(a)) <= tol)
          .otherwise(abs(col(a) - col(e)) / abs(col(e)) <= tol)
      Seq(round(col(e), 4).as(e), ok.as(s"p${pct(p)}_ok"))
    }
    df.agg(aggs.head, aggs.tail: _*).select(out: _*)
  }

  /** Column-name-safe percent label: integral probs render bare
    * ("p50"); fractional percents keep their digits with '_' for '.'
    * ("p99_9") so 0.999 and 1.0 cannot collide on a rounded "p100". */
  private def pct(p: Double): String =
    new java.math.BigDecimal(p.toString).multiply(new java.math.BigDecimal(100))
      .stripTrailingZeros.toPlainString.replace(".", "_")
  private def pName(p: Double, suffix: String)(c: org.apache.spark.sql.Column) =
    c.as(s"p${pct(p)}$suffix")
}
