package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TokenOps.XrefCand

/** A2's order-sensitive overflow merge as a native Catalyst aggregate
  * (TypedImperativeAggregate) — the SURVEY §4 stretch goal, replacing the
  * `collect_list + UDF` pair: the candidate buffer accumulates/merges as
  * a plain byte-serialized list (partial aggregation works map-side), and
  * `eval` sorts + folds once per group via [[TokenOps.mergeXref]].
  * Output: `array<struct<xref string, notes string>>` (explode to rows).
  *
  * Buffers hold (xref, notes) string pairs only — the per-group payload
  * the UDF path shipped through a Spark Row array, minus the generic Row
  * envelope and the UDF serialization boundary.
  */
case class XrefMergeAgg(
    xref: Expression, notes: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(String, String)]] {

  override def children: Seq[Expression] = Seq(xref, notes)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("xref", StringType), StructField("notes", StringType))))
  override def prettyName: String = "xref_merge"

  override def createAggregationBuffer(): ArrayBuffer[(String, String)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(String, String)],
                      input: InternalRow): ArrayBuffer[(String, String)] = {
    val x = xref.eval(input)
    val n = notes.eval(input)
    buf += ((if (x == null) null else x.toString,
             if (n == null) null else n.toString))
    buf
  }

  override def merge(b1: ArrayBuffer[(String, String)],
                     b2: ArrayBuffer[(String, String)]): ArrayBuffer[(String, String)] =
    b1 ++= b2

  override def eval(buf: ArrayBuffer[(String, String)]): Any = {
    val sorted = buf
      .map { case (x, n) => XrefCand(x, n) }
      .sortBy(c => (Option(c.xref).getOrElse(""), Option(c.notes).getOrElse("")))
    val merged = TokenOps.mergeXref(sorted.toSeq, cap)
    new GenericArrayData(merged.map(m => InternalRow(
      UTF8String.fromString(m.xref), UTF8String.fromString(m.notes))).toArray)
  }

  override def serialize(buf: ArrayBuffer[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (x, n) =>
      def w(s: String): Unit =
        if (s == null) out.writeInt(-1)
        else { val b = s.getBytes("UTF-8"); out.writeInt(b.length); out.write(b) }
      w(x); w(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(String, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    def r(): String = {
      val len = in.readInt()
      if (len < 0) null
      else { val b = new Array[Byte](len); in.readFully(b); new String(b, "UTF-8") }
    }
    val buf = ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < n) { buf += ((r(), r())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): XrefMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): XrefMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(xref = newChildren(0), notes = newChildren(1))
}

object XrefMergeAgg {
  /** Column form: `xref_merge(xref, notes, cap)` aggregate. */
  def xref_merge(xref: Column, notes: Column, cap: Int): Column =
    bridge.column(XrefMergeAgg(bridge.expression(xref),
      bridge.expression(notes), cap).toAggregateExpression())
}
