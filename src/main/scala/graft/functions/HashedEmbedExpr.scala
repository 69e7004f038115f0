package graft.functions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}

/** Fused feature-hashing embedding over a token array — ONE pass
  * replacing the interpreted HOF chain in
  * [[graft.text.TextAnalysis.hashedEmbeddings]] (md5-struct transform,
  * O(dim) signed-histogram fold per token, norm fold, per-element
  * division — every lambda evaluated interpreted, with intermediate
  * struct/array allocations per row; measured ~1.6 ms/doc at sf0.1,
  * the dominant cost of the text->vector bridge that SemDeDup, chunk
  * search and embedding dedup all stand on).
  *
  * EXACT parity with the column form (NativeExprSpec pins it over the
  * corpus and on edge cases; the text_hash_embed DuckDB oracle
  * recomputes the same family):
  *  - bucket = first 4 md5 bytes as an unsigned 32-bit value mod `dim`
  *    (== `conv(substring(md5hex, 1, 8), 16, 10) % dim` — same value);
  *  - sign = +1 when the 9th hex digit < 8 (== high bit of md5 byte 4
  *    clear);
  *  - histogram adds exact ±1.0 doubles (order-free by exactness);
  *  - norm = sqrt of the left-to-right sum of squares (Math.sqrt, the
  *    same correctly-rounded op SQRT lowers to);
  *  - zero norm -> raw zero histogram as floats, else per-element
  *    double division then float cast — identical IEEE ops.
  * Null tokens are skipped (the fold form's null-condition CASE keeps
  * the accumulator unchanged for them).
  */
case class HashedEmbedExpr(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0 && dim <= 65536, s"dim must be in [1, 65536], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_embed requires array<string> input, got $other")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hashed_embed"

  def compute(input: ArrayData): ArrayData = {
    val hist = new Array[Double](dim)
    val n = input.numElements()
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val digest = DigestUtils.md5(input.getUTF8String(i).getBytes)
        val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        val sign = if ((digest(4) & 0x80) == 0) 1.0 else -1.0
        hist((v % dim).toInt) += sign
      }
      i += 1
    }
    var acc = 0.0
    var j = 0
    while (j < dim) { acc += hist(j) * hist(j); j += 1 }
    val norm = math.sqrt(acc)
    val out = new Array[Any](dim)
    j = 0
    while (j < dim) {
      out(j) =
        if (norm == 0.0) hist(j).toFloat else (hist(j) / norm).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // invoke-object codegen (the md5 work dwarfs one virtual call per
    // row); the projection stays inside whole-stage codegen
    val self = ctx.addReferenceObj("hashedEmbedExpr", this,
      classOf[HashedEmbedExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedEmbedExpr {
  def hashed_embed(tokens: Column, dim: Int): Column =
    bridge.column(HashedEmbedExpr(bridge.expression(tokens), dim))
}
