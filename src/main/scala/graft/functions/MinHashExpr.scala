package graft.functions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused K-minhash over a token array — one pass replacing K interpreted
  * `array_min(transform(toks, t => md5(concat(lit(s"$j:"), t))))`
  * column passes (each allocates an intermediate hash array per row and
  * evaluates its lambda outside codegen).
  *
  * EXACT parity with that column form (the DuckDB oracle recomputes the
  * same md5-string family): hash j of a token = lowercase-hex md5 of the
  * UTF-8 bytes of "<j>:<token>", minimum taken in byte-lexicographic
  * order (= string order for ASCII hex); null tokens are skipped like
  * `array_min`, and an array with no tokens yields null elements.
  */
case class MinHashExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"minhash k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash requires array<string> input, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until k).map(j => s"$j:".getBytes("UTF-8")).toArray

  /** Single pass over the tokens; called from both eval and codegen. */
  def compute(input: ArrayData): ArrayData = {
    val mins = new Array[String](k)
    val n = input.numElements()
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val tok = input.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          val pre = prefixes(j)
          val buf = new Array[Byte](pre.length + tok.length)
          System.arraycopy(pre, 0, buf, 0, pre.length)
          System.arraycopy(tok, 0, buf, pre.length, tok.length)
          val hex = DigestUtils.md5Hex(buf)
          if (mins(j) == null || hex.compareTo(mins(j)) < 0) mins(j) = hex
          j += 1
        }
      }
      i += 1
    }
    val out: Array[Any] =
      mins.map(m => if (m == null) null else UTF8String.fromString(m))
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // invoke-object codegen: the md5 work dwarfs the one virtual call per
    // row, and the projection stays inside whole-stage codegen
    val self = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpr {
  def minhash(tokens: Column, k: Int): Column =
    bridge.column(MinHashExpr(bridge.expression(tokens), k))
}
