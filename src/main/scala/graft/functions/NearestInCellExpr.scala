package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Nearest-centroid argmax against a centroid set carried in the ROW
  * (an `array<struct<fine_id: long, cent_vec: array<double>>>` column,
  * typically broadcast-joined per coarse cell) — the fine-level
  * assignment primitive of the two-level SemDeDup quantizer
  * ([[graft.similarity.Similarity.semDedupHier]]).
  *
  * [[NearestCentroidExpr]] embeds its quantizer as driver data in the
  * expression itself, which caps total centroids at
  * [[graft.similarity.Similarity.maxCentroids]] (a literal plan can't
  * grow past what the driver can hold and every executor must
  * deserialize). Here the centroid sets live in a DataFrame and arrive
  * per row through a join, so the TOTAL centroid count across cells is
  * unbounded — only one cell's array is in memory per row.
  *
  * Scoring is IDENTICAL to [[NearestCentroidExpr]] (same round-6
  * HALF_UP cosine, same left-to-right fold order, ties to the smallest
  * id, NaN-greatest comparator, loud failure on a dimension mismatch),
  * so a flat assignment and a one-cell hierarchical assignment agree
  * bit-for-bit — pinned in NativeExprSpec.
  *
  * Null/empty centroid array -> null (no argmax exists); null elements
  * inside the array are skipped.
  */
case class NearestInCellExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _),
          ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(FloatType | DoubleType, _), _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "nearest_in_cell requires (array<float|double>, " +
        s"array<struct<long, array<float|double>>>), got $l and $r")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_in_cell"

  @transient private lazy val vecIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val centIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  def compute(input: ArrayData, cellsArr: ArrayData): java.lang.Long = {
    val n = input.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (vecIsFloat) input.getFloat(i).toDouble else input.getDouble(i)
      i += 1
    }
    var vAcc = 0.0
    i = 0
    while (i < n) { vAcc += v(i) * v(i); i += 1 }
    val vNorm = math.sqrt(vAcc)
    var bestScore = 0.0
    var bestId = 0L
    var any = false
    var j = 0
    val m = cellsArr.numElements()
    while (j < m) {
      // a null struct OR a struct with a null cent_vec (e.g. cells built
      // through a left join) is "no centroid here" — skip, don't NPE
      val row = if (cellsArr.isNullAt(j)) null else cellsArr.getStruct(j, 2)
      val c = if (row == null || row.isNullAt(1)) null else row.getArray(1)
      if (c != null) {
        val cid = row.getLong(0)
        val cn = c.numElements()
        if (cn != n) throw new IllegalArgumentException(
          s"nearest_in_cell: input vector has $n elements but centroid " +
            s"$cid has $cn — dimensions must match (DotProductExpr contract)")
        var d = 0.0
        var cAcc = 0.0
        var k = 0
        while (k < cn) {
          val cv = if (centIsFloat) c.getFloat(k).toDouble else c.getDouble(k)
          d += v(k) * cv
          cAcc += cv * cv
          k += 1
        }
        val nn = vNorm * math.sqrt(cAcc)
        val raw = if (nn > 0) d / nn else 0.0
        // lazy rounding: BigDecimal only on candidates that could win
        if (!any || CosineArgmax.mightWin(raw, bestScore)) {
          val score = CosineArgmax.round6(raw)
          if (CosineArgmax.wins(score, cid, any, bestScore, bestId)) {
            any = true
            bestScore = score
            bestId = cid
          }
        }
      }
      j += 1
    }
    if (any) java.lang.Long.valueOf(bestId) else null
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestInCellExpr", this,
      classOf[NearestInCellExpr].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = $self.compute($v, $c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestInCellExpr {
  def nearest_in_cell(vec: Column, cells: Column): Column =
    bridge.column(NearestInCellExpr(
      bridge.expression(vec), bridge.expression(cells)))
}
