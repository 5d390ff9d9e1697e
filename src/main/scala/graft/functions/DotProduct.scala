package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, DoubleType, FloatType, NumericType}

/** Native dot product over two numeric arrays — the hot instruction of
  * embedding similarity (SURVEY §7 ext.llm; brief: "a native Catalyst
  * Expression (with doGenCode) beats a Scala UDF").
  *
  * The composable form (`zip_with` + `aggregate`) allocates an
  * intermediate array and walks lambda closures per element; this
  * expression compiles to a tight primitive loop over the two
  * ArrayData buffers — no allocation, no virtual calls — and stays
  * inside whole-stage codegen. Interpreted path provided for
  * completeness (eval), codegen path via doGenCode.
  *
  * Nulls: SQL-standard — NULL if either array is NULL; null ELEMENTS
  * contribute 0 (embeddings never carry null elements; documented).
  * Mismatched lengths raise, catching data corruption early.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two numeric arrays, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: length mismatch ($n vs ${ys.numElements()})")
    val lt = elemType(left)
    val rt = elemType(right)
    // Spark's Decimal is not a java.lang.Number — needs its own branch
    // (mirrors genGet) or the interpreted path (constant folding,
    // codegen fallback) would ClassCastException on decimal arrays.
    def get(arr: ArrayData, dt: DataType, i: Int): Double = dt match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
      case _ => arr.get(i, dt).asInstanceOf[Number].doubleValue()
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        acc += get(xs, lt, i) * get(ys, rt, i)
      }
      i += 1
    }
    acc
  }

  private def genGet(arr: String, dt: DataType, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case org.apache.spark.sql.types.IntegerType => s"(double) $arr.getInt($i)"
    case org.apache.spark.sql.types.LongType => s"(double) $arr.getLong($i)"
    case org.apache.spark.sql.types.ShortType => s"(double) $arr.getShort($i)"
    case org.apache.spark.sql.types.ByteType => s"(double) $arr.getByte($i)"
    case d: org.apache.spark.sql.types.DecimalType =>
      s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalStateException(
      s"graft_dot codegen: unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = genGet(a, elemType(left), i)
      val getB = genGet(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ($getA) * ($getB);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
