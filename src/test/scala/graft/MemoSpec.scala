package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared memo-maintenance helper behind the three dimension memos
  * (DagClosure.descendantsCache, AnnotationPipeline.fixpointCache /
  * xdbGuardCache): identity-keyed entries must not outlive their owning
  * SparkSession, and an unbounded spec-churn cache clears wholesale.
  */
class MemoSpec extends SparkSpec {

  private def cacheWith(df: DataFrame, n: Int) = {
    val c = new ConcurrentHashMap[(DataFrame, Long), java.lang.Boolean]
    (1 to n).foreach(i => c.put((df, i.toLong), java.lang.Boolean.TRUE))
    c
  }

  test("maintain keeps live-session entries and clears past the cap") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("x")
    val small = cacheWith(df, 3)
    Memo.maintain(small)(_._1.sparkSession)
    assert(small.size === 3, "live-session entries survive maintenance")

    val big = cacheWith(df, 70)
    Memo.maintain(big)(_._1.sparkSession)
    assert(big.isEmpty, "an over-cap cache clears wholesale")
  }

  // LAST test in the suite: stops the shared context, then restores a
  // fresh default session so later suites in the same JVM are unaffected
  // (suites run sequentially in sbt's single forked test JVM)
  test("maintain evicts entries whose owning session has stopped") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val cache = cacheWith(df, 2)
    spark.stop()
    try {
      Memo.maintain(cache)(_._1.sparkSession)
      assert(cache.isEmpty,
        "entries keyed by frames of a stopped session must be evicted")
    } finally {
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
  }
}
