package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Fused hashed-feature logit mean over a token array — ONE pass
  * replacing the interpreted HOF pair in
  * [[graft.text.QualityClassifier.scoreColumn]] (a `transform` hashing
  * every token to a bucket index, then an `aggregate` folding
  * `element_at(weightsLit, i)` — both lambdas evaluate interpreted per
  * token, and the 4096-double weights literal is boxed per access).
  * Classifier scoring is map-only over the WHOLE corpus in the
  * curate-full composition, the regime where the r8 "interpreted-HOF
  * tax" lesson applies verbatim.
  *
  * EXACT parity with the column form (NativeExprSpec pins scores over
  * the corpus and on edge cases against the retained HOF reference):
  *  - bucket = `pmod(xxhash64(token), dim)` — the SAME XXH64 Spark's
  *    `xxhash64` lowers to (seed 42, hash of the UTF8String bytes),
  *    with pmod's sign fix-up; the +1/element_at 1-basing of the HOF
  *    form cancels out;
  *  - mean = left-to-right double fold of `w(bucket)` divided by the
  *    TOTAL element count (`size` semantics);
  *  - empty array -> 0.0 (the HOF's `when(size > 0, ...).otherwise(0)`
  *    collapses into the expression); null array -> null (standard
  *    propagation — the caller coalesces, preserving the
  *    null-text -> sigmoid(bias) contract);
  *  - null ELEMENTS are skipped but still counted in the divisor; the
  *    tokenizer never emits them (the HOF form would null the whole
  *    fold — unreachable on both paths).
  */
case class LogitScoreExpr(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  require(weights.nonEmpty, "empty weight vector")

  private val w = weights.toArray
  private val dim = w.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"logit_mean requires array<string> input, got $other")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "logit_mean"

  def compute(input: ArrayData): Double = {
    val n = input.numElements()
    if (n == 0) return 0.0
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val s = input.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val b = ((h % dim) + dim) % dim
        acc += w(b.toInt)
      }
      i += 1
    }
    acc / n
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // invoke-object codegen (hashing dwarfs one virtual call per row);
    // the projection stays inside whole-stage codegen
    val self = ctx.addReferenceObj("logitScoreExpr", this,
      classOf[LogitScoreExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LogitScoreExpr {
  def logit_mean(tokens: Column, weights: Seq[Double]): Column =
    bridge.column(LogitScoreExpr(bridge.expression(tokens), weights))
}
