package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Character mass of the dominant word n-gram: over all (overlapping)
  * n-grams of a token array, `max(count(g) * chars(g))` — the numerator
  * of the Gopher/MassiveText "fraction of characters in the most common
  * n-gram" repetition rule (Rae et al. 2021, §A1.1). The max is taken
  * over the PRODUCT, not over count alone, so documents where a long
  * gram repeats slightly less often than a short one still score the
  * larger character mass — and ties need no arbitrary gram choice: the
  * result is deterministic without a tiebreak.
  *
  * One hash-map pass per row (native + codegen'd); the equivalent
  * builtin form is a doubly-nested interpreted lambda
  * (`transform(distinct, g -> size(filter(grams, = g)))`) — O(d·t) per
  * row with per-element allocation. Fewer than n tokens yields 0.
  * Gram text joins tokens with single spaces (null tokens skipped,
  * `array_join` semantics, matching [[ShinglesExpr]]).
  */
case class TopGramCharsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"gram width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_gram_chars requires array<string> input, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "top_gram_chars"

  def compute(input: ArrayData): Long = {
    val len = input.numElements()
    if (len < n) return 0L
    val toks = GramOps.tokens(input)
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i <= len - n) {
      counts.merge(GramOps.gram(toks, i, n), 1L, (a, b) => a + b)
      i += 1
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // code points, not UTF-16 units — matches SQL length() in both
      // Spark (UTF8String.numChars) and DuckDB for non-BMP text
      val k = e.getKey
      val mass = e.getValue * k.codePointCount(0, k.length)
      if (mass > best) best = mass
    }
    best
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("topGramCharsExpr", this,
      classOf[TopGramCharsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopGramCharsExpr {
  def topGramChars(tokens: Column, n: Int): Column =
    bridge.column(TopGramCharsExpr(bridge.expression(tokens), n))
}
