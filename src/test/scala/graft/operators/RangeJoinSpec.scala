package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, Long)*) = rows.toDF("pid", "p")
  private def ivs(rows: (Long, Long, Long)*) = rows.toDF("iid", "s", "e")

  private def run(left: Seq[(Long, Long)], right: Seq[(Long, Long, Long)],
                  w: Long) =
    RangeJoin.pointInInterval(pts(left: _*), ivs(right: _*), "p", "s", "e", w)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("matches equal the naive theta-join on half-open intervals") {
    val left = Seq(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 17L, 5L -> 23L)
    val right = Seq((10L, 0L, 10L), (11L, 5L, 6L), (12L, 10L, 24L),
      (13L, 22L, 23L))
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val naive = for {
        (pid, p) <- left; (iid, s, e) <- right if s <= p && p < e
      } yield (pid, iid)
      assert(run(left, right, w) === naive.toSet, s"bucketWidth=$w")
    }
  }

  test("empty and inverted intervals match nothing; boundaries half-open") {
    val got = run(Seq(1L -> 5L, 2L -> 6L),
      Seq((10L, 5L, 5L), (11L, 6L, 4L), (12L, 5L, 6L)), w = 4L)
    assert(got === Set((1L, 12L))) // p=5 in [5,6); p=6 not (end open)
  }

  test("negative points bucket consistently") {
    val got = run(Seq(1L -> -7L, 2L -> -1L, 3L -> 0L),
      Seq((10L, -8L, 0L), (11L, -1L, 2L)), w = 5L)
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("equi-keys scope the match") {
    val left = Seq((1L, 1L, 5L), (2L, 2L, 5L)).toDF("pid", "k", "p")
    val right = Seq((10L, 1L, 0L, 10L), (11L, 2L, 0L, 10L))
      .toDF("iid", "k", "s", "e")
    val got = RangeJoin.pointInInterval(left, right, "p", "s", "e", 4L,
      keys = Seq("k")).select($"pid", $"iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 11L)))
  }

  test("an interval spanning too many buckets fails loudly") {
    val e = intercept[Exception] {
      run(Seq(1L -> 5L), Seq((10L, 0L, 100000L)), w = 2L)
    }
    assert(e.getMessage.contains("spans more than"),
      s"unexpected: ${e.getMessage}")
  }

  test("plan is an equi-join on the bucket, not a nested-loop join") {
    val left = pts(1L -> 0L, 2L -> 5L)
    val right = ivs((10L, 0L, 10L))
    val plan = RangeJoin.pointInInterval(left, right, "p", "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
