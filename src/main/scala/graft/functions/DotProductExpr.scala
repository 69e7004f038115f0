package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd sequential-fold dot product over two numeric arrays —
  * the hot-path replacement for `aggregate(zip_with(a, b, _*_), 0.0, _+_)`:
  * higher-order functions evaluate their lambdas interpreted (no
  * whole-stage codegen) and allocate an intermediate products array per
  * row, which dominates the pairwise-similarity operators.
  *
  * EXACT parity with the HOF form (oracle hashes must not move):
  * elements cast to double, products summed left-to-right (same IEEE
  * order), empty arrays fold to 0.0, and a length mismatch or null
  * element yields NULL (zip_with pads the shorter side with null, which
  * nulls the fold).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOf(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemOf(left.dataType) == FloatType
    val rf = elemOf(right.dataType) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, side: Expression): String =
        if (elemOf(side.dataType) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = $xa.numElements();
         |if ($n != $ya.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xa.isNullAt($i) || $ya.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(xa, left)} * ${get(ya, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProductExpr(bridge.expression(a), bridge.expression(b)))
}
