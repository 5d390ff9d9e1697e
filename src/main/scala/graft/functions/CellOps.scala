package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Centroid assignment / probe routing as REFERENCE-OBJECT expressions
  * — the large-K scale fix for the IVF family (r20, the round-19
  * verdict's top item).
  *
  * The previous construction carried every centroid as an expression
  * LITERAL (`typedLit` array folds / one struct per cell): ideal at
  * gate-sized K (≤ 32), but the generated code and the analyzed plan
  * both grow O(K·dim) — at the K ~ 2^14..2^18 cells a 100 TB corpus
  * wants, that means multi-MB plans, Janino's 64 KB method limit
  * (silent interpreted fallback), and minutes of driver analysis per
  * stage. These expressions instead hold the centroid table as a
  * PLAIN JVM ARRAY attached to the expression object — the same
  * mechanism Spark's own `might_contain` uses for its Bloom filter
  * (`ctx.addReferenceObj`): generated code is O(1) in K (one static
  * helper call per row), the model rides the closure/broadcast
  * serialization exactly like a literal would, and the per-row work
  * is the same O(K·dim) argmin — now as a tight primitive loop
  * instead of K folded Catalyst aggregates, so it is FASTER at small
  * K too, not just viable at large K.
  *
  * Exactness: each helper replicates its literal-fold predecessor's
  * arithmetic decision for decision —
  *  - dot products accumulate ascending-index with null elements
  *    contributing 0 ([[DotProduct]]'s contract),
  *  - cosine comparisons use `java.lang.Double.compare`, which orders
  *    NaN greatest — bit-for-bit Spark's double ordering (`greatest`
  *    / `sort_array` semantics),
  *  - integer distances are plain associative long sums,
  *  - argmin/argmax ties break toward the SMALLER cell id (ascending
  *    scan with strict improvement),
  *  - probe routing returns cells in the literal path's exact order:
  *    cosine descending / integer distance ascending, cell id
  *    ascending on ties.
  * `AutoBlockSpec`/`IvfPqSpec` pin expression ≡ literal fold on real
  * corpora including a K = 256 configuration the gates never reach.
  */
object CellOps {

  // element-type tags for the shared numeric accessor (computed once
  // at expression-construction time, never per row)
  final val TDouble = 0
  final val TFloat = 1
  final val TLong = 2
  final val TInt = 3
  final val TShort = 4
  final val TByte = 5

  private[functions] def tagOf(dt: DataType, site: String): Int = dt match {
    case ArrayType(DoubleType, _) => TDouble
    case ArrayType(FloatType, _) => TFloat
    case ArrayType(LongType, _) => TLong
    case ArrayType(IntegerType, _) => TInt
    case ArrayType(ShortType, _) => TShort
    case ArrayType(ByteType, _) => TByte
    case other => throw new IllegalStateException(
      s"$site: unsupported vector type ${other.simpleString}")
  }

  @inline private def getD(arr: ArrayData, tag: Int, i: Int): Double =
    tag match {
      case TDouble => arr.getDouble(i)
      case TFloat => arr.getFloat(i).toDouble
      case TLong => arr.getLong(i).toDouble
      case TInt => arr.getInt(i).toDouble
      case TShort => arr.getShort(i).toDouble
      case _ => arr.getByte(i).toDouble
    }

  /** Ascending-index dot of `vec` against a centroid — [[DotProduct]]'s
    * accumulation order and null-element rule, so the cosine equals
    * the literal path's `graft_dot(vec, lit(cent)) / nrm` bitwise. */
  @inline private def dotCent(vec: ArrayData, tag: Int,
                              cent: Array[Double]): Double = {
    val n = vec.numElements()
    if (cent.length != n)
      throw new IllegalArgumentException(
        s"CellOps: length mismatch ($n vs ${cent.length})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) acc += getD(vec, tag, i) * cent(i)
      i += 1
    }
    acc
  }

  /** Integer squared L2 of an `array<long>` row against a centroid —
    * the associative long sum of [[graft.sim.IvfPq]]'s `iDist`. */
  @inline private def iDistCent(vec: ArrayData,
                                cent: Array[Long]): Long = {
    val n = vec.numElements()
    if (cent.length != n)
      throw new IllegalArgumentException(
        s"CellOps: length mismatch ($n vs ${cent.length})")
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = vec.getLong(i) - cent(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** struct(cell, ang) of the max-cosine centroid: ties to the smaller
    * cell id; ang clamped exactly like the literal path's
    * `acos(least(greatest(c, -1), 1))` including its NaN behavior
    * (greatest propagates NaN, least then picks 1.0). */
  def nearestUnit(vec: ArrayData, nrm: Double,
                  cents: Array[Array[Double]], tag: Int): InternalRow = {
    var bi = 0
    var bc = dotCent(vec, tag, cents(0)) / nrm
    var j = 1
    while (j < cents.length) {
      val c = dotCent(vec, tag, cents(j)) / nrm
      if (java.lang.Double.compare(c, bc) > 0) { bc = c; bi = j }
      j += 1
    }
    val g = if (java.lang.Double.compare(bc, -1.0) > 0) bc else -1.0
    val l = if (java.lang.Double.compare(g, 1.0) < 0) g else 1.0
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bi, math.acos(l)))
  }

  /** Argmin integer-L2 cell: strict improvement on an ascending scan —
    * the literal fold's `d < acc.d` tie-break (smallest cell wins). */
  def nearestLong(vec: ArrayData, cents: Array[Array[Long]]): Int = {
    var bi = 0
    var bd = iDistCent(vec, cents(0))
    var j = 1
    while (j < cents.length) {
      val d = iDistCent(vec, cents(j))
      if (d < bd) { bd = d; bi = j }
      j += 1
    }
    bi
  }

  /** [[nearestLong]] over a per-row-selected codebook group — the
    * Lloyd-pass shape ([[graft.sim.IvfPq]]: coarse training is group
    * 0, book training is one group per subvector). */
  def nearestLongGrouped(vec: ArrayData, g: Int,
                         cents3: Array[Array[Array[Long]]]): Int =
    nearestLong(vec, cents3(g))

  /** `vec - cents(cell)` as `array<long>` — the residual the PQ books
    * model; replicates `zip_with(xq, element_at(cl, cell+1), _-_)`. */
  def longResidual(vec: ArrayData, cell: Int,
                   cents: Array[Array[Long]]): ArrayData = {
    val c = cents(cell)
    val n = vec.numElements()
    if (c.length != n)
      throw new IllegalArgumentException(
        s"CellOps: length mismatch ($n vs ${c.length})")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = vec.getLong(i) - c(i); i += 1 }
    new GenericArrayData(out)
  }

  /** The per-(probe, cell) ADC lookup table off a residual:
    * `lut(s)(j)` = integer squared L2 between residual subvector `s`
    * and book entry `(s, j)` — replicates the nested
    * `transform(sequence(0, m-1), s => transform(books(s), iDist))`
    * construction, books as a reference object. */
  def longProbeLut(prl: ArrayData,
                   books: Array[Array[Array[Long]]]): ArrayData = {
    val m = books.length
    val sd = books(0)(0).length
    if (prl.numElements() != m * sd)
      throw new IllegalArgumentException(
        s"CellOps: residual length ${prl.numElements()} != m*subDim " +
          s"(${m * sd})")
    val out = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val ks = books(s).length
      val row = new Array[Long](ks)
      var j = 0
      while (j < ks) {
        val cent = books(s)(j)
        var acc = 0L
        var i = 0
        while (i < sd) {
          val d = prl.getLong(s * sd + i) - cent(i)
          acc += d * d
          i += 1
        }
        row(j) = acc
        j += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** The `nprobe` nearest cells by cosine DESCENDING, cell id ascending
    * on ties — the literal path's `sort_array(array(struct(c, -cell)),
    * asc=false)` order (NaN sorts first, Spark's double ordering). */
  def routedUnit(vec: ArrayData, nrm: Double, cents: Array[Array[Double]],
                 nprobe: Int, tag: Int): ArrayData = {
    val k = cents.length
    val cos = new Array[Double](k)
    var j = 0
    while (j < k) { cos(j) = dotCent(vec, tag, cents(j)) / nrm; j += 1 }
    val idx = Array.range(0, k)
    // stable sort on cosine descending: equal cosines keep ascending
    // cell order — exactly the (c, -cell) lexicographic struct sort
    val boxed = idx.sortWith((a, b) => {
      val c = java.lang.Double.compare(cos(a), cos(b))
      if (c != 0) c > 0 else a < b
    })
    new GenericArrayData(boxed.take(math.min(nprobe, k)))
  }

  /** The `nprobe` nearest cells by integer L2 ASCENDING, cell id
    * ascending on ties — the literal path's `sort_array(array(
    * struct(d, cell)))` order. */
  def routedLong(vec: ArrayData, cents: Array[Array[Long]],
                 nprobe: Int): ArrayData = {
    val k = cents.length
    val ds = new Array[Long](k)
    var j = 0
    while (j < k) { ds(j) = iDistCent(vec, cents(j)); j += 1 }
    val boxed = Array.range(0, k).sortWith((a, b) => {
      val c = java.lang.Long.compare(ds(a), ds(b))
      if (c != 0) c < 0 else a < b
    })
    new GenericArrayData(boxed.take(math.min(nprobe, k)))
  }
}

/** `struct(cell int, ang double)` of the nearest unit centroid —
  * [[graft.sim.AutoBlock]]'s assignment expression with the centroid
  * table as a reference object (see [[CellOps]]). Null-intolerant:
  * every call site pre-filters null vectors / non-finite norms. */
case class NearestUnitCell(vec: Expression, nrm: Expression,
                           cents: Array[Array[Double]])
  extends BinaryExpression {

  require(cents.nonEmpty, "NearestUnitCell: empty centroid table")

  override def left: Expression = vec
  override def right: Expression = nrm
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nearest_unit_cell"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, nrm.dataType) match {
      case (ArrayType(_: NumericType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (numeric array, double), got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("ang", DoubleType, nullable = false)))

  private lazy val tag = CellOps.tagOf(vec.dataType, prettyName)

  override def nullSafeEval(v: Any, n: Any): Any =
    CellOps.nearestUnit(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], cents, tag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val c = ctx.addReferenceObj("cents", cents, "double[][]")
      s"${ev.value} = graft.functions.CellOps.nearestUnit($v, $n, $c, $tag);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestUnitCell =
    copy(vec = newLeft, nrm = newRight)
}

/** Argmin integer-L2 cell id over a long centroid table —
  * [[graft.sim.IvfPq]]'s assignment expression, reference-object form
  * (see [[CellOps]]). */
case class NearestLongCell(vec: Expression, cents: Array[Array[Long]])
  extends UnaryExpression {

  require(cents.nonEmpty, "NearestLongCell: empty centroid table")

  override def child: Expression = vec
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nearest_long_cell"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    CellOps.nearestLong(v.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.addReferenceObj("cents", cents, "long[][]")
      s"${ev.value} = graft.functions.CellOps.nearestLong($v, $c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestLongCell = copy(vec = newChild)
}

/** [[NearestLongCell]] with the codebook group selected per row —
  * the Lloyd training pass's assignment (coarse = group 0, books =
  * one group per subvector). */
case class NearestLongCellGrouped(vec: Expression, g: Expression,
                                  cents3: Array[Array[Array[Long]]])
  extends BinaryExpression {

  require(cents3.nonEmpty && cents3.forall(_.nonEmpty),
    "NearestLongCellGrouped: empty codebook group")

  override def left: Expression = vec
  override def right: Expression = g
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nearest_long_cell_grouped"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, g.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint>, int), got $other")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any, gv: Any): Any =
    CellOps.nearestLongGrouped(v.asInstanceOf[ArrayData],
      gv.asInstanceOf[Int], cents3)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, gv) => {
      val c = ctx.addReferenceObj("cents3", cents3, "long[][][]")
      s"${ev.value} = graft.functions.CellOps.nearestLongGrouped($v, $gv, $c);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestLongCellGrouped =
    copy(vec = newLeft, g = newRight)
}

/** `vec - cents(cell)` — the coarse residual, reference-object form. */
case class LongCellResidual(vec: Expression, cell: Expression,
                            cents: Array[Array[Long]])
  extends BinaryExpression {

  require(cents.nonEmpty, "LongCellResidual: empty centroid table")

  override def left: Expression = vec
  override def right: Expression = cell
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_long_cell_residual"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, cell.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint>, int), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any, c: Any): Any =
    CellOps.longResidual(v.asInstanceOf[ArrayData],
      c.asInstanceOf[Int], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val cs = ctx.addReferenceObj("cents", cents, "long[][]")
      s"${ev.value} = graft.functions.CellOps.longResidual($v, $c, $cs);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongCellResidual =
    copy(vec = newLeft, cell = newRight)
}

/** The per-(probe, cell) m×ks ADC LUT off a residual — books as a
  * reference object. */
case class LongProbeLut(prl: Expression, books: Array[Array[Array[Long]]])
  extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty),
    "LongProbeLut: empty codebook")

  override def child: Expression = prl
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_long_probe_lut"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    prl.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def nullSafeEval(v: Any): Any =
    CellOps.longProbeLut(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("books", books, "long[][][]")
      s"${ev.value} = graft.functions.CellOps.longProbeLut($v, $b);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): LongProbeLut = copy(prl = newChild)
}

/** `array<int>` of the probe's `nprobe` nearest cells, cosine
  * descending — the batch-ANN router, reference-object form. */
case class RoutedUnitCells(vec: Expression, nrm: Expression,
                           cents: Array[Array[Double]], nprobe: Int)
  extends BinaryExpression {

  require(cents.nonEmpty, "RoutedUnitCells: empty centroid table")
  require(nprobe >= 0, s"RoutedUnitCells: nprobe must be >= 0, got $nprobe")

  override def left: Expression = vec
  override def right: Expression = nrm
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_routed_unit_cells"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, nrm.dataType) match {
      case (ArrayType(_: NumericType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (numeric array, double), got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val tag = CellOps.tagOf(vec.dataType, prettyName)

  override def nullSafeEval(v: Any, n: Any): Any =
    CellOps.routedUnit(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], cents, nprobe, tag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val c = ctx.addReferenceObj("cents", cents, "double[][]")
      s"${ev.value} = graft.functions.CellOps.routedUnit($v, $n, $c, $nprobe, $tag);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RoutedUnitCells =
    copy(vec = newLeft, nrm = newRight)
}

/** `array<int>` of the probe's `nprobe` nearest cells, integer L2
  * ascending — [[graft.sim.IvfPq]]'s router, reference-object form. */
case class RoutedLongCells(vec: Expression, cents: Array[Array[Long]],
                           nprobe: Int)
  extends UnaryExpression {

  require(cents.nonEmpty, "RoutedLongCells: empty centroid table")
  require(nprobe >= 0, s"RoutedLongCells: nprobe must be >= 0, got $nprobe")

  override def child: Expression = vec
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_routed_long_cells"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    CellOps.routedLong(v.asInstanceOf[ArrayData], cents, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.addReferenceObj("cents", cents, "long[][]")
      s"${ev.value} = graft.functions.CellOps.routedLong($v, $c, $nprobe);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): RoutedLongCells = copy(vec = newChild)
}
