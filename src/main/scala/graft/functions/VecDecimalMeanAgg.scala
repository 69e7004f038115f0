package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Element-wise exact-decimal mean of an `array<double>` (or
  * `array<float>`) column in ONE aggregation pass — the Lloyd/PQ
  * training step that previously cost a `posexplode` (n·dim exploded
  * rows through the shuffle) + `avg(decimal)` + a second groupBy with
  * `array_sort(collect_list(struct))` to reassemble the vector. The
  * buffer is dim exact decimal sums + a count, so the shuffle carries
  * one partial buffer per (group × partition) instead of n·dim rows,
  * and the reassembly groupBy disappears.
  *
  * Value parity with the old chain is BIT-EXACT by construction
  * (pinned in NativeExprSpec against the verbatim reconstructed
  * column formula), so every training digest downstream is unchanged:
  *
  *   - each element enters the sum as Spark's `cast(x as decimal(27,10))`
  *     does it: `new BigDecimal(Double.toString(x))` rescaled to 10,
  *     HALF_UP (float input widens to double first, same as Cast);
  *   - the mean replays `avg(decimal(27,10))`: Decimal./ divides at
  *     MAX_SCALE=38 HALF_UP and the cast to avg's decimal(31,14)
  *     result type rounds HALF_UP at scale 14 (probed empirically on
  *     Spark 4.1.2 — the exact quotient rounded at 14); finally
  *     `.cast("double")` is `BigDecimal.doubleValue`.
  *
  * Sums are order-independent (exact decimal addition commutes), so
  * results are deterministic under any partitioning — the same
  * argument that makes the old decimal-avg chain digest-safe.
  *
  * Null ARRAYS are skipped like avg skips null inputs; null ELEMENTS
  * and ragged lengths throw — training vectors are dense by
  * construction, and silently diverging from the old chain's
  * per-position counts would corrupt a centroid without a trace.
  */
case class VecDecimalMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecDecimalMeanAgg.Buf] {

  import VecDecimalMeanAgg.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_decimal_mean"

  // lazy: the column form constructs this over an UNRESOLVED attribute
  // (no dataType yet); Catalyst re-instantiates post-resolution via
  // withNewChildrenInternal
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => false
    case ArrayType(FloatType, _) => true
    case other => throw new IllegalArgumentException(
      s"vec_decimal_mean needs array<double> or array<float>, got $other")
  }

  override def createAggregationBuffer(): Buf = new Buf(0L, null)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.sums == null) buf.sums = Array.fill(n)(JBigDecimal.ZERO)
    require(buf.sums.length == n,
      s"vec_decimal_mean: ragged input — ${buf.sums.length} vs $n elements")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i),
        s"vec_decimal_mean: null element at position $i")
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      // exactly Cast(double -> decimal(27,10)): string-exact BigDecimal,
      // rescaled HALF_UP
      buf.sums(i) = buf.sums(i).add(
        new JBigDecimal(java.lang.Double.toString(x))
          .setScale(10, RoundingMode.HALF_UP))
      i += 1
    }
    buf.count += 1L
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    if (b2.sums == null) return b1
    if (b1.sums == null) { b1.sums = b2.sums; b1.count = b2.count; return b1 }
    require(b1.sums.length == b2.sums.length,
      s"vec_decimal_mean: ragged merge — ${b1.sums.length} vs ${b2.sums.length}")
    var i = 0
    while (i < b1.sums.length) {
      b1.sums(i) = b1.sums(i).add(b2.sums(i)); i += 1
    }
    b1.count += b2.count
    b1
  }

  override def eval(buf: Buf): Any = {
    if (buf.count == 0L || buf.sums == null) return null
    val cnt = JBigDecimal.valueOf(buf.count)
    // replay avg's division (probed empirically on Spark 4.1.2, pinned
    // in NativeExprSpec): Decimal./ divides at MAX_SCALE=38 HALF_UP,
    // then the cast to avg's decimal(31,14) result type rounds HALF_UP
    // at scale 14 — the exact quotient rounded at 14 for every
    // magnitude training ever sees
    val out = new Array[Any](buf.sums.length)
    var i = 0
    while (i < buf.sums.length) {
      out(i) = buf.sums(i).divide(cnt, 38, RoundingMode.HALF_UP)
        .setScale(14, RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      buf.sums.foreach { s =>
        // sums stay at scale 10 (every addend is scale 10); store the
        // unscaled integer
        val b = s.setScale(10).unscaledValue().toByteArray
        out.writeInt(b.length); out.write(b)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    if (n < 0) new Buf(count, null)
    else {
      val sums = new Array[JBigDecimal](n)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b)
        sums(i) = new JBigDecimal(new java.math.BigInteger(b), 10)
        i += 1
      }
      new Buf(count, sums)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): VecDecimalMeanAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecDecimalMeanAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object VecDecimalMeanAgg {
  /** dim exact decimal sums + the member count; sums null until the
    * first row fixes the dimension. */
  final class Buf(var count: Long, var sums: Array[JBigDecimal])

  /** Column form: element-wise exact-decimal mean of an array column. */
  def vec_decimal_mean(vec: Column): Column =
    bridge.column(VecDecimalMeanAgg(bridge.expression(vec))
      .toAggregateExpression())
}
