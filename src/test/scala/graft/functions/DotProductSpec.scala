package graft.functions

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals the composable zip_with+aggregate dot") {
    val emb = graft.Tables.load(spark, sf(), "embeddings")
    val both = emb.select(
      Similarity.dotComposed(col("embedding"), col("embedding")).as("composed"),
      GraftExtensions.dot(col("embedding"), col("embedding")).as("native"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }

  test("works over double arrays and int arrays") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(GraftExtensions.dot(col("a"), col("b")))
      .as[Double].collect().head == 32.0)
    val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    assert(ints.select(GraftExtensions.dot(col("a"), col("b")))
      .as[Double].collect().head == 11.0)
  }

  test("NULL array → NULL; length mismatch raises") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(GraftExtensions.dot(col("a"), col("b")))
      .collect().head.isNullAt(0))
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(GraftExtensions.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause.getMessage.contains("length mismatch"))
  }

  test("decimal arrays work on the INTERPRETED path (Decimal is not a Number)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DecimalType}
    // direct eval = the interpreted path (constant folding, codegen fallback)
    val arr = Literal.create(Seq(BigDecimal("1.50"), BigDecimal("2.00")),
      ArrayType(DecimalType(10, 2)))
    val got = DotProduct(arr, arr).eval(InternalRow.empty).asInstanceOf[Double]
    assert(math.abs(got - 6.25) < 1e-12)
    // and through the optimizer: foldable input triggers interpreted eval
    val d = typedLit(Seq(BigDecimal("1.50"), BigDecimal("2.00")))
    val folded = spark.range(1).select(GraftExtensions.dot(d, d).as("v"))
      .as[Double].collect().head
    assert(math.abs(folded - 6.25) < 1e-12)
  }

  test("registered SQL function: SELECT graft_dot(...)") {
    GraftExtensions.registerAll(spark)
    graft.Tables.registerAll(spark, sf())
    val r = spark.sql(
      "SELECT round(graft_dot(embedding, embedding), 4) AS d FROM embeddings LIMIT 3")
      .as[Double].collect()
    assert(r.length == 3 && r.forall(_ > 0.0))
  }

  test("the FULL native-expression registry is SQL-callable") {
    GraftExtensions.registerAll(spark)
    graft.Tables.registerAll(spark, sf())
    // every graft_* expression callable from plain SQL, one statement
    val r = spark.sql(
      """SELECT graft_simhash32(text) AS sh,
                graft_rolling_hash(text) AS rh,
                graft_lsh_sig(text, 3, 4).bands[0] AS b0,
                graft_jaccard(sort_array(graft_lsh_sig(text, 3, 4).sh),
                              sort_array(graft_lsh_sig(text, 3, 4).sh)) AS self_j
         FROM documents WHERE text IS NOT NULL LIMIT 5""").collect()
    assert(r.length == 5)
    assert(r.forall(_.getDouble(3) == 1.0), "self-Jaccard must be 1.0")
    // literal-arg validation: a non-literal band count is rejected
    val e = intercept[Exception] {
      spark.sql("SELECT graft_lsh_sig(text, 3, CAST(doc_id AS INT)) FROM documents")
        .collect()
    }
    assert(e.getMessage.contains("literal int"))
  }

  test("non-numeric arrays rejected at analysis") {
    val df = Seq((Seq("x"), Seq("y"))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftExtensions.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("numeric array") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("micro-bench: native is not slower than composable (informational)") {
    val emb = graft.Tables.load(spark, sf("sf0.1"), "embeddings")
      .select(col("embedding")).cache()
    emb.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    emb.select(sum(Similarity.dotComposed(col("embedding"), col("embedding")))).collect()
    emb.select(sum(GraftExtensions.dot(col("embedding"), col("embedding")))).collect()
    val tComposed = time {
      (1 to 5).foreach { _ =>
        emb.select(sum(Similarity.dotComposed(col("embedding"), col("embedding")))).collect()
      }
    }
    val tNative = time {
      (1 to 5).foreach { _ =>
        emb.select(sum(GraftExtensions.dot(col("embedding"), col("embedding")))).collect()
      }
    }
    info(f"composable: $tComposed%.3fs, native: $tNative%.3fs, " +
      f"speedup ${tComposed / tNative}%.1fx")
    emb.unpersist()
    // informational only: wall-clock guards flake under CI contention;
    // PlanQualitySpec pins that the native expression is actually used
  }
}
