package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles over a token array in ONE pass — the
  * native replacement for
  * `array_distinct(transform(sequence(0, size-n), i =>
  *   array_join(slice(toks, i+1, n), " ")))`,
  * whose lambda evaluates interpreted and allocates a slice + joined
  * string + positions array per row.
  *
  * EXACT parity with that column form: fewer than n tokens yields an
  * empty array; shingles are space-joined in token order; null tokens
  * are skipped inside a window like `array_join`; distinct keeps first
  * occurrence order like `array_distinct`.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string> input, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  def compute(input: ArrayData): ArrayData = {
    val len = input.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val toks = GramOps.tokens(input)
    var i = 0
    while (i <= len - n) {
      seen.add(GramOps.gram(toks, i, n)) // array_join skips null elements
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shinglesExpr", this, classOf[ShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpr {
  def shingles(tokens: Column, n: Int): Column =
    bridge.column(ShinglesExpr(bridge.expression(tokens), n))
}
