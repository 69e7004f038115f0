package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides of a recurring join
  * on the join key removes the per-query shuffle entirely — at 100 TB
  * this converts the nightly classify-merge join from a full shuffle of
  * the fact table into a map-side zip of co-located buckets.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without a shuffle exchange") {
    // explicit per-table paths: nothing lands in the static warehouse dir
    val wh = Files.createTempDirectory("graft_wh").toString
    val sf = "/root/testdata/sf0.001"

    Tables.orders(spark, sf)
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    // disable broadcast so the planner must exploit the bucketing (at
    // real scale neither side would be broadcastable anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      finally {}

    val p = joined.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // co-located buckets: the sort-merge join reads both sides with NO
    // shuffle exchange under it
    assert(p.contains("SortMergeJoin"), p)
    val joinPart = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning"),
      "bucketed join should be shuffle-free below the join:\n" + p)

    // and results match the plain join
    val expect = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
