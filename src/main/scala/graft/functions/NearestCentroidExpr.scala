package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused nearest-centroid argmax against a driver-embedded quantizer —
  * ONE pass replacing
  * `element_at(sort_array(transform(centLit, c => struct(round(cosine(
  * v, c.cent_vec), 6), -cent_id)), desc), 1)` (the assignment form in
  * [[graft.similarity.Similarity.assignToCentroids]]): the transform
  * lambda evaluates interpreted per centroid per row, recomputes
  * `norm(v)` per centroid, allocates a struct array per row, and sorts
  * it just to read element 1. The SemDeDup pipeline evaluates that
  * chain ~5x per document (two Lloyd assigns, both pair-join sides,
  * the output join).
  *
  * EXACT parity with the column form (NativeExprSpec pins argmax
  * equality over the corpus against the sort_array formula):
  *  - score = round(cosine, 6) with cosine = when(n > 0, dot/n).
  *    otherwise(0.0), n = norm(v) * norm(cent): dot and both norms are
  *    the same left-to-right double folds (DotProductExpr order), and
  *    round replicates Round's HALF_UP `BigDecimal.valueOf` path;
  *  - winner = max (score, -cent_id) lexicographic — ties on the
  *    rounded score resolve to the SMALLEST cent_id, exactly like the
  *    descending struct sort;
  *  - norm(v) computes once per row, norm(cent) once per expression
  *    instance (same values the inline form recomputed per pair).
  * Null vector elements make dot/norm null in the column form, nulling
  * the score; such vectors never occur (embeddings are containsNull =
  * false) and the cap guard in centroid collection rejects empty sets,
  * mirroring centroidLit.
  */
case class NearestCentroidExpr(child: Expression,
                               cents: Seq[(Long, Seq[Double])])
    extends UnaryExpression {

  require(cents.nonEmpty, "empty centroid set")
  require(cents.length <= graft.similarity.Similarity.maxCentroids,
    s"${cents.length} centroids exceed the literal-quantizer cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float|double> input, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val ids: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Double]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val centNorms: Array[Double] = vecs.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  def compute(input: ArrayData): Long = {
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = input.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) input.getFloat(i).toDouble else input.getDouble(i)
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
    while (j < vecs.length) {
      val c = vecs(j)
      if (c.length != n) throw new IllegalArgumentException(
        s"nearest_centroid: input vector has $n elements but centroid " +
          s"${ids(j)} has ${c.length} — dimensions must match " +
          s"(DotProductExpr contract)")
      var d = 0.0
      var k = 0
      while (k < n) { d += v(k) * c(k); k += 1 }
      val nn = vNorm * centNorms(j)
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

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroidExpr", this,
      classOf[NearestCentroidExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidExpr {
  def nearest_centroid(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    bridge.column(NearestCentroidExpr(bridge.expression(vec), cents))
}
