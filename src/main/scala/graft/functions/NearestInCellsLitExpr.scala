package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Fine-level nearest-centroid argmax against a DRIVER-EMBEDDED
  * two-level quantizer: `(vec, coarse_id) -> fine_id`. The join form
  * ([[NearestInCellExpr]] below a broadcast cells join) pays, per ROW,
  * an ArrayData struct walk and a from-scratch self-norm for every
  * centroid of its cell — row-invariant work that an r13 probe
  * measured as the dominant cost of both the fine-Lloyd iterations and
  * every two-level assignment pass (the proportional-quota fat cell
  * multiplies it: one 31%-population cell carried a 188-centroid
  * argmax per member row). Here the cells are decoded ONCE per
  * expression instance into primitive arrays with precomputed norms;
  * the per-row cost is the dot products alone.
  *
  * Total centroids are capped at
  * [[graft.similarity.Similarity.maxCentroids]] — the same literal-
  * quantizer bound as [[NearestCentroidExpr]], and exactly the bound
  * [[graft.similarity.Similarity.trainTwoLevelCentroids]] enforces on
  * the geometry. [[graft.similarity.Similarity.semDedupHier]] keeps
  * the join form: its geometry is allowed past the broadcast budget.
  *
  * EXACT parity with the join form (NativeExprSpec pins fine_id
  * equality over random data against the broadcast-join +
  * nearest_in_cell chain): same round-6 HALF_UP cosine, same
  * left-to-right fold order (the precomputed self-norm is the same
  * fold the join form ran inline), ties to the smallest fine_id via
  * ascending iteration (the cells arrive sorted by fine_id — the join
  * form's array_sort order), NaN-greatest comparator, loud failure on
  * a dimension mismatch.
  *
  * An unknown coarse_id (or a null input) THROWS rather than silently
  * dropping the row like the old inner join did: every producer of a
  * two-level quantizer restricts the coarse level to LIVE cells, so a
  * miss is a caller bug (an un-restricted or stale quantizer), not a
  * data condition.
  */
case class NearestInCellsLitExpr(left: Expression, right: Expression,
    cells: Map[Long, Seq[(Long, Seq[Double])]])
    extends BinaryExpression {

  require(cells.nonEmpty, "empty fine-cell set")
  require(cells.valuesIterator.map(_.size).sum <=
    graft.similarity.Similarity.maxCentroids,
    s"${cells.valuesIterator.map(_.size).sum} fine centroids exceed " +
      "the literal-quantizer cap")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "nearest_in_cells_lit requires (array<float|double>, bigint), " +
          s"got $l and $r")
    }

  override def dataType: DataType = LongType
  // null-in -> null-out (BinaryExpression default); non-null inputs
  // always produce an id or throw
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "nearest_in_cells_lit"

  @transient private lazy val vecIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // binary-searchable decoded form: per cell, fine ids ASCENDING (the
  // join form's array_sort order) with vectors and precomputed norms
  @transient private lazy val cellKeys: Array[Long] =
    cells.keysIterator.toArray.sorted
  @transient private lazy val cellFineIds: Array[Array[Long]] =
    cellKeys.map(k => cells(k).sortBy(_._1).map(_._1).toArray)
  @transient private lazy val cellVecs: Array[Array[Array[Double]]] =
    cellKeys.map(k => cells(k).sortBy(_._1).map(_._2.toArray).toArray)
  @transient private lazy val cellNorms: Array[Array[Double]] =
    cellVecs.map(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      math.sqrt(acc)
    })

  def compute(input: ArrayData, cellId: Long): Long = {
    val slot = java.util.Arrays.binarySearch(cellKeys, cellId)
    if (slot < 0) throw new IllegalArgumentException(
      s"nearest_in_cells_lit: coarse cell $cellId has no fine " +
        "centroids — the quantizer must restrict its coarse level to " +
        "live cells (trainTwoLevelCentroids does)")
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
    val ids = cellFineIds(slot)
    val vecs = cellVecs(slot)
    val norms = cellNorms(slot)
    var bestScore = 0.0
    var bestId = 0L
    var any = false
    var j = 0
    while (j < vecs.length) {
      val c = vecs(j)
      if (c.length != n) throw new IllegalArgumentException(
        s"nearest_in_cells_lit: input vector has $n elements but fine " +
          s"centroid ${ids(j)} of cell $cellId has ${c.length} — " +
          "dimensions must match (DotProductExpr contract)")
      var d = 0.0
      var k = 0
      while (k < n) { d += v(k) * c(k); k += 1 }
      val nn = vNorm * norms(j)
      val raw = if (nn > 0) d / nn else 0.0
      // lazy rounding: BigDecimal only on candidates that could win
      if (!any || CosineArgmax.mightWin(raw, bestScore)) {
        val score = CosineArgmax.round6(raw)
        if (CosineArgmax.wins(score, ids(j), any, bestScore, bestId)) {
          any = true
          bestScore = score
          bestId = ids(j)
        }
      }
      j += 1
    }
    bestId
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestInCellsLitExpr", this,
      classOf[NearestInCellsLitExpr].getName)
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = $self.compute($v, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestInCellsLitExpr {
  def nearest_in_cells_lit(vec: Column, coarseId: Column,
      cells: Map[Long, Seq[(Long, Seq[Double])]]): Column =
    bridge.column(NearestInCellsLitExpr(
      bridge.expression(vec), bridge.expression(coarseId), cells))
}
