package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct lowercase whitespace tokens in ONE pass — the native
  * replacement for
  * `filter(array_distinct(split(lower(trim(text)), "\\s+")), len > 0)`
  * (the `filter` lambda evaluates interpreted on every row of every
  * dedup signature map).
  *
  * Parity: trim then lowercase via the same UTF8String ops Spark's
  * `trim`/`lower` use; the split class is Java regex `\s` = the six
  * ASCII whitespace chars; distinct keeps first-occurrence order and
  * empty segments vanish — all exactly like the column chain (order is
  * additionally irrelevant downstream: min/sort/vote consumers).
  */
case class TokensExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokens requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(input: UTF8String): GenericArrayData = {
    val s = input.trim().toLowerCase().toString
    val seen = new java.util.LinkedHashSet[String]()
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || isWs(s.charAt(i))) {
        if (i > start) seen.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokensExpr", this, classOf[TokensExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokensExpr {
  def tokens(text: Column): Column =
    bridge.column(TokensExpr(bridge.expression(text)))
}
