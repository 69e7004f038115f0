package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `[|,]`-delimited token split, space-trimmed, empties dropped — one
  * native pass replacing the per-row interpreted
  * `filter(transform(split(c, "[|,]"), trim), length > 0)` chain feeding
  * the A4 consolidation aggregate.
  *
  * Parity: the delimiter class is exactly {'|', ','}; trim removes only
  * ASCII spaces like Spark's `trim`; empty segments (incl. trailing)
  * vanish under the length filter either way.
  */
case class TokenSplitExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"split_trim_tokens requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "split_trim_tokens"

  def compute(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == '|' || s.charAt(i) == ',') {
        var a = start
        var b = i - 1
        while (a <= b && s.charAt(a) == ' ') a += 1
        while (b >= a && s.charAt(b) == ' ') b -= 1
        if (b >= a) out += UTF8String.fromString(s.substring(a, b + 1))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenSplitExpr", this, classOf[TokenSplitExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSplitExpr {
  def splitTokens(c: Column): Column =
    bridge.column(TokenSplitExpr(bridge.expression(c)))
}
