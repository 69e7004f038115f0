package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): a vector of
  * dim D splits into `m` subvectors of D/m dims, each quantized against
  * its own `ksub`-entry codebook, so a float32 vector stores as `m`
  * small integers (here 64-dim float32 = 256 B -> 8 B at m=8) and an
  * approximate dot product is `m` table lookups (ADC — asymmetric
  * distance computation: the QUERY stays exact, only the corpus side is
  * quantized).
  *
  * All three are native codegen'd expressions for the same reason as
  * [[DotProductExpr]]: the HOF forms evaluate interpreted, and encode
  * (corpus-sized, m*ksub*subDim work per row) and ADC (per candidate
  * PAIR) are the hot paths. Codebooks are driver-embedded like
  * [[NearestCentroidExpr]]'s quantizer — bounded by construction
  * (ksub*D doubles, e.g. 256*768 = 1.5 MB at real embedding widths) and
  * shipped once per task via the serialized expression.
  *
  * Shared layout: `codebooks(s*ksub + c)` is sub-centroid `c` of
  * subspace `s`, each of length subDim; a LUT is the same layout
  * flattened to doubles. Dimension or code-range mismatches THROW
  * (the NearestCentroidExpr contract — a silent wrong-length fold is
  * the bug class round 8 banned).
  */
private[functions] object PqOps {
  def checkVecType(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float|double> input, got $other")
  }

  def toDoubles(input: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = input.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      // a null ELEMENT reads as 0.0 from the unsafe array — silently
      // encoding a corrupted vector; throw instead (same loud contract
      // as the dimension checks; embeddings are containsNull=false, so
      // this never fires on well-formed inputs)
      if (input.isNullAt(i)) throw new IllegalArgumentException(
        s"pq: null element at index $i of a ${n}-element vector")
      v(i) = if (isFloat) input.getFloat(i).toDouble else input.getDouble(i)
      i += 1
    }
    v
  }

  def requireGeometry(codebooks: Array[Array[Double]], ksub: Int): Unit = {
    require(ksub > 0, s"ksub must be positive: $ksub")
    require(codebooks.nonEmpty && codebooks.length % ksub == 0,
      s"codebook count ${codebooks.length} is not a multiple of ksub $ksub")
    require(codebooks.length <= graft.similarity.Similarity.maxCentroids,
      s"${codebooks.length} sub-centroids exceed the literal-quantizer cap")
    val subDim = codebooks(0).length
    require(subDim > 0 && codebooks.forall(_.length == subDim),
      "ragged codebook: all sub-centroids must share one subDim")
  }
}

/** Encode a vector to its `m` PQ codes: per subspace, the L2-nearest
  * sub-centroid (ties resolve to the SMALLEST code, like the argmax
  * kernels). Map-only, one fused pass — the index-build hot path.
  */
case class PqEncodeExpr(child: Expression,
                        codebooks: Array[Array[Double]], ksub: Int)
    extends UnaryExpression {

  PqOps.requireGeometry(codebooks, ksub)
  private val m = codebooks.length / ksub
  private val subDim = codebooks(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    PqOps.checkVecType(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  def compute(input: ArrayData): ArrayData = {
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val v = PqOps.toDoubles(input, isFloat)
    if (v.length != m * subDim) throw new IllegalArgumentException(
      s"pq_encode: input vector has ${v.length} elements but the model " +
        s"expects m*subDim = ${m * subDim} — dimensions must match")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var best = 0.0
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val cb = codebooks(s * ksub + c)
        var d = 0.0
        var k = 0
        while (k < subDim) {
          val diff = v(base + k) - cb(k)
          d += diff * diff
          k += 1
        }
        // strict < keeps the smallest code on exact ties
        if (c == 0 || d < best) { best = d; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncodeExpr", this,
      classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: `lut(s*ksub + c) = <q_sub(s), codebook(s,c)>`
  * (left-to-right double fold, DotProductExpr order). Runs once per QUERY
  * row — m*ksub*subDim work that every candidate pair then amortizes to
  * `m` lookups.
  */
case class PqLutExpr(child: Expression,
                     codebooks: Array[Array[Double]], ksub: Int)
    extends UnaryExpression {

  PqOps.requireGeometry(codebooks, ksub)
  private val m = codebooks.length / ksub
  private val subDim = codebooks(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    PqOps.checkVecType(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  def compute(input: ArrayData): ArrayData = {
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val v = PqOps.toDoubles(input, isFloat)
    if (v.length != m * subDim) throw new IllegalArgumentException(
      s"pq_lut: input vector has ${v.length} elements but the model " +
        s"expects m*subDim = ${m * subDim} — dimensions must match")
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var c = 0
      while (c < ksub) {
        val cb = codebooks(s * ksub + c)
        var d = 0.0
        var k = 0
        while (k < subDim) { d += v(base + k) * cb(k); k += 1 }
        lut(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqLutExpr", this,
      classOf[PqLutExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC sum: `Σ_s lut(s*ksub + codes(s))` with `ksub = |lut| / |codes|`
  * — the approximate dot product between the lut's query and the codes'
  * corpus vector, evaluated per candidate pair (the search hot path).
  * Also computes code sq-norms when fed the model's `‖sub-centroid‖²`
  * table as the lut. A lut length that doesn't divide by the code count
  * or a code outside [0, ksub) throws; null elements yield NULL
  * (DotProductExpr contract).
  */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    val lutOk = right.dataType match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _                                    => false
    }
    if (codesOk && lutOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<int> codes, array<float|double> lut), got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  def compute(codes: ArrayData, lut: ArrayData): Any = {
    val m = codes.numElements()
    val lutLen = lut.numElements()
    if (m == 0 || lutLen % m != 0) throw new IllegalArgumentException(
      s"pq_adc: lut length $lutLen is not a positive multiple of the " +
        s"code count $m")
    val ksub = lutLen / m
    val lutFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) throw new IllegalArgumentException(
        s"pq_adc: code $c at subspace $s outside [0, $ksub)")
      val i = s * ksub + c
      if (lut.isNullAt(i)) return null
      acc += (if (lutFloat) lut.getFloat(i).toDouble else lut.getDouble(i))
      s += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcExpr", this,
      classOf[PqAdcExpr].getName)
    val r = ctx.freshName("adcResult")
    nullSafeCodeGen(ctx, ev, (c, l) => s"""
       |Object $r = $self.compute($c, $l);
       |if ($r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((Double) $r).doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqExprs {
  def pq_encode(vec: Column, codebooks: Array[Array[Double]],
                ksub: Int): Column =
    bridge.column(PqEncodeExpr(bridge.expression(vec), codebooks, ksub))

  def pq_lut(vec: Column, codebooks: Array[Array[Double]],
             ksub: Int): Column =
    bridge.column(PqLutExpr(bridge.expression(vec), codebooks, ksub))

  def pq_adc(codes: Column, lut: Column): Column =
    bridge.column(PqAdcExpr(bridge.expression(codes), bridge.expression(lut)))
}
