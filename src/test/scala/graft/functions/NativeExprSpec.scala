package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.operators.SaltedAgg

class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private def jvmHash(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  test("rolling_hash64 codegen matches the JVM reference fold") {
    val inputs = Seq("hello", "", "a", "PMID:12345", "ünïcode ţêxt")
    val got = inputs.toDF("s")
      .select($"s", GraftFunctions.rolling_hash64($"s").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(s => assert(got(s) === jvmHash(s), s"mismatch for '$s'"))
  }

  test("rolling_hash64 null propagates and SQL registration works") {
    GraftFunctions.register(spark)
    val got = Seq(Some("x"), None).toDF("s")
      .selectExpr("rolling_hash64(s) AS h").collect()
    assert(got.exists(_.isNullAt(0)))
    assert(got.exists(r => !r.isNullAt(0) && r.getLong(0) === jvmHash("x")))
  }

  test("rolling_hash64 stays inside whole-stage codegen") {
    // local Seq relations skip codegen entirely — use a file scan
    val plan = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(GraftFunctions.rolling_hash64($"text"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("rolling_hash64"), plan)
  }

  test("XrefMergeAgg buffer serde round-trips nulls and unicode") {
    val agg = XrefMergeAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      org.apache.spark.sql.catalyst.expressions.Literal("y"), cap = 4000)
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)](
      ("PMID:1|PMID:2", null), (null, "nötés ünïcode"), ("", ""))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
    assert(agg.deserialize(agg.serialize(
      scala.collection.mutable.ArrayBuffer.empty[(String, String)])).isEmpty)
  }

  test("salted count equals plain groupBy count") {
    val df = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val plain = df.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SaltedAgg.saltedCount(df, Seq("o_orderpriority"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

}
