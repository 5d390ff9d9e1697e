package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers graft's native expressions
  * as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or call [[GraftExtensions.registerAll]] on a live session — after
  * which `SELECT graft_dot(a, b)` works from plain SQL, and the typed
  * [[dot]] helper from the DataFrame API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {

  private[functions] val dotFunction
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  /** Register on an already-built session (tests, REPL). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = dotFunction
    spark.sessionState.functionRegistry
      .registerFunction(ident, info, builder)
  }

  /** Typed Column helper over the native expression — no registry
    * needed; builds the expression node directly. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
  }
}
