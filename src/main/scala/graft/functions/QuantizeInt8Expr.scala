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
  *    exactly like the abs(cast) lambda). A NON-FINITE element throws
  *    loudly (same contract as a null element): Spark compares NaN
  *    greater than every numeric, so the column form's scale becomes
  *    NaN (or ±Inf makes x/scale NaN) and its tinyint cast throws
  *    CAST_OVERFLOW under ANSI — a silent native fallback would
  *    instead emit garbage codes (measured: Java's NaN.toByte is 0).
  *    Parity holds exactly on finite inputs and both forms FAIL on
  *    non-finite ones (NativeExprSpec pins both);
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
      // the column form throws here too (ANSI tinyint cast of the NaN
      // that a NaN/Inf element pushes through scale) — fail loudly
      // rather than silently skip NaN in the max (a > maxAbs is false
      // for NaN) and quantize the rest on the wrong scale
      if (java.lang.Double.isNaN(a) || java.lang.Double.isInfinite(a))
        throw new IllegalArgumentException(
          s"quantize_int8: non-finite element ${v(i)} at index $i")
      if (a > maxAbs) maxAbs = a
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
