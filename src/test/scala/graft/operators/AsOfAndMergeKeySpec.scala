package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Regression specs for two review findings:
  *  - as-of join must carry the most recent right ROW even when its
  *    individual payload fields are null (per-column last(ignoreNulls)
  *    skipped back to older rows);
  *  - insert surrogate keys must be deterministic in the data, not in
  *    the physical partitioning (monotonically_increasing_id was not).
  */
class AsOfAndMergeKeySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: a null payload field on the as-of row wins over older non-nulls") {
    import spark.implicits._
    val left = Seq(("k", ts("2026-01-01 03:00:00"))).toDF("key", "l_ts")
    val right = Seq(
      ("k", ts("2026-01-01 01:00:00"), Some("old"), Some(1)),
      ("k", ts("2026-01-01 02:00:00"), None, Some(2))) // as-of row, null payload
      .toDF("key", "r_ts", "val_s", "val_i")
    val out = AsOfJoin.asOf(left, right, "key", "l_ts", "r_ts",
      Seq("val_s", "val_i")).head()
    assert(out.getAs[String]("val_s") === null) // NOT "old"
    assert(out.getAs[Int]("val_i") === 2)
  }

  test("asOf: left rows before any right row get an all-null payload") {
    import spark.implicits._
    val left = Seq(("k", ts("2026-01-01 00:30:00"))).toDF("key", "l_ts")
    val right = Seq(("k", ts("2026-01-01 01:00:00"), Some("x"), Some(1)))
      .toDF("key", "r_ts", "val_s", "val_i")
    val out = AsOfJoin.asOf(left, right, "key", "l_ts", "r_ts",
      Seq("val_s", "val_i")).head()
    assert(out.getAs[String]("val_s") === null)
    assert(out.isNullAt(out.fieldIndex("val_i")))
  }

  test("merge: insert surrogate keys are deterministic across physical plans") {
    import spark.implicits._
    val existing = graft.gaf.Fixtures.emptyFullAnnot(spark)
    def incoming(parts: Int) = {
      val base = (1 to 500).map(i => (s"GO:$i", 1000 + i, "IDA"))
        .toDF("term_acc", "annotated_object_rgd_id", "evidence")
        .withColumn("ref_rgd_id", lit(1))
        .repartition(parts) // different physical layouts per call
      val cols = graft.gaf.Dims.fullAnnot.fieldNames
      cols.foldLeft(base) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(graft.gaf.Dims.fullAnnot(c).dataType))
      }.select(cols.map(col): _*).drop("full_annot_key", "created_date",
        "last_modified_date", "created_by", "last_modified_by")
    }
    def keyMap(parts: Int): Map[String, Long] =
      MergeSink.merge(existing, incoming(parts), ts("2026-01-01 00:00:00"), 190)
        .select("term_acc", "full_annot_key").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    val m3 = keyMap(3)
    val m7 = keyMap(7)
    assert(m3 === m7) // same data -> same keys, regardless of partitioning
    assert(m3.values.toSeq.distinct.size === m3.size) // unique
    assert(m3.values.forall(_ > 0)) // strictly above maxKey(=0)
  }
}
