package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class DagClosureSpec extends SparkSpec {

  private def edges(rows: (String, String)*) =
    spark.createDataFrame(
      java.util.List.of(rows.map(r => Row(r._1, r._2)): _*),
      StructType(Seq(StructField("p", StringType), StructField("c", StringType))))

  test("closure of a chain reaches all transitive pairs") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "d")
    val got = DagClosure.closure(e, "p", "c").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a","b"), ("a","c"), ("a","d"),
      ("b","c"), ("b","d"), ("c","d")))
  }

  test("closure handles diamonds without duplicates") {
    val e = edges("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d")
    val got = DagClosure.closure(e, "p", "c")
    assert(got.count() === got.distinct().count())
    assert(got.filter("ancestor = 'a' and descendant = 'd'").count() === 1)
  }

  test("descendantsOf walks multiple levels (CONNECT BY parity)") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "d", "x" -> "y")
    val got = DagClosure.descendantsOf(e, "p", "c", org.apache.spark.sql.functions.lit("a")).collect()
      .map(_.getString(0)).toSet
    assert(got === Set("b", "c", "d"))
  }

  test("descendantsOf of a leaf is empty") {
    val e = edges("a" -> "b")
    assert(DagClosure.descendantsOf(e, "p", "c", org.apache.spark.sql.functions.lit("b")).isEmpty)
  }
}
