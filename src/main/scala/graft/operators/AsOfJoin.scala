package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the single right row with
  * the greatest `rightTs <= leftTs` within the same key — snapshot
  * alignment for event streams, embedding versions, dimension history.
  *
  * Implemented by COMPOSITION (guide preference (a)): tag + union both
  * sides, one window pass per key ordered by (ts, side) carrying the
  * last-seen right payload forward, keep left rows. ONE shuffle on the
  * key — same cost as the sort-merge join a custom physical operator
  * would do, with zero custom plan nodes to maintain.
  *
  * The right side must be unique per (key, ts) — pre-aggregate if not —
  * otherwise "the" as-of match is ill-defined (engines would tie-break
  * arbitrarily).
  */
object AsOfJoin {

  /** @param left      left rows (kept, enriched)
    * @param right     right rows (payload source), unique per (key, ts)
    * @param key       equi-key column name present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (must not clash with left)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select((leftCols.map(col) :+ col("_ts") :+ col("_side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select((leftCols.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("_ts") :+ col("_side")) ++ payload.map(col): _*)

    // right rows sort before left rows at equal ts (inclusive <=)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry ONE struct of all payload columns (non-null exactly on right
    // rows), so the most recent right ROW wins even when its individual
    // payload fields are null — last(col, ignoreNulls) per column would
    // skip back to an older row's non-null value, which is wrong as-of
    // semantics for nullable payloads
    val packed = l.unionByName(r).withColumn("_payload",
      when(col("_side") === 0, struct(payload.map(col): _*)))
    val carried = packed
      .withColumn("_carried", last(col("_payload"), ignoreNulls = true).over(w))
    payload.foldLeft(carried) { (df, p) =>
      df.withColumn(p, col("_carried").getField(p))
    }.filter(col("_side") === 1).drop("_ts", "_side", "_payload", "_carried")
  }
}
