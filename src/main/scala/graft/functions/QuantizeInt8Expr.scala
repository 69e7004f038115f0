package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused symmetric int8 code array — ONE pass replacing the column form
  * `transform(v, x => round(x / scale).cast(tinyint).cast(double))` with
  * `scale = when(array_max(transform(v, abs)) > 0, maxAbs/127).otherwise(1)`:
  * the HOF lambdas evaluate interpreted with per-row array allocations
  * (the residual ~60% of the int8 ranker's cost at the 100k-row fan-out
  * after the r11 O(dim²) fix; see PqScaleMain in BASELINE.md).
  *
  * EXACT parity with the column form (NativeExprSpec pins code equality
  * over the corpus):
  *  - maxAbs = max over |x_i| as doubles (float inputs widened first,
  *    exactly like the abs(cast) lambda), with NaN propagating as the
  *    MAXIMUM — array_max's ordering treats NaN greatest, so a NaN
  *    element forces maxAbs = NaN, the `> 0` test false, scale 1.0;
  *  - scale = maxAbs/127.0 when maxAbs > 0 else 1.0, kept as a DOUBLE
  *    (the column form divides by the pre-float-cast scale);
  *  - code_i = round(x_i/scale, 0) replicating Round's HALF_UP
  *    `BigDecimal.valueOf` path (shared [[CosineArgmax.round0]]), cast
  *    to byte by Spark's double->tinyint rule (toByte truncation — the
  *    rounded value is integral and within ±127 by construction), then
  *    widened back to double (the ranker consumes double code arrays);
  *  - a null ELEMENT yields NULL output (the lambda's cast(null) nulls
  *    that element and abs(null) nulls maxAbs — the whole-array NULL is
  *    the conservative superset, and embeddings are containsNull=false
  *    so neither occurs in practice).
  */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    PqOps.checkVecType(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  def compute(input: ArrayData): Any = {
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = input.numElements()
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) return null
      i += 1
    }
    val v = PqOps.toDoubles(input, isFloat)
    var maxAbs = Double.NegativeInfinity
    i = 0
    while (i < n) {
      val a = math.abs(v(i))
      // NaN-greatest like array_max (a > maxAbs is false for NaN, which
      // would silently SKIP it and quantize [NaN, 5.0] on a 5.0 scale
      // where the column form falls to the scale-1.0 branch)
      if (a > maxAbs || java.lang.Double.isNaN(a)) maxAbs = a
      i += 1
    }
    val scale = if (n > 0 && maxAbs > 0) maxAbs / 127.0 else 1.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = CosineArgmax.round0(v(i) / scale).toByte.toDouble
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("quantizeInt8Expr", this,
      classOf[QuantizeInt8Expr].getName)
    val r = ctx.freshName("q8Result")
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object $r = $self.compute($c);
       |if ($r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8Expr {
  def quantize_int8(vec: Column): Column =
    bridge.column(QuantizeInt8Expr(bridge.expression(vec)))
}
