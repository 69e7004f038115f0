package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], gap: Long) =
    Sessionize.byGap(rows.toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
        r.getAs[Long]("n_events"))).toSet

  test("byGap splits on silence > gap, keeps <= gap together") {
    // user 1: events at 0, 5, 20, 26 with gap 10 -> [0,5], [20,26]
    // user 2: single event -> its own session
    val got = run(Seq(
      (1L, 0L, 0L), (1L, 5L, 1L), (1L, 20L, 2L), (1L, 26L, 3L),
      (2L, 100L, 4L)), gap = 10L)
    assert(got === Set(
      (1L, 1L, 0L, 5L, 2L), (1L, 2L, 20L, 26L, 2L),
      (2L, 1L, 100L, 100L, 1L)))
  }

  test("byGap boundary: a gap of exactly `gap` does NOT split") {
    val got = run(Seq((1L, 0L, 0L), (1L, 10L, 1L), (1L, 21L, 2L)), gap = 10L)
    assert(got === Set((1L, 1L, 0L, 10L, 2L), (1L, 2L, 21L, 21L, 1L)))
  }

  test("byGap: equal timestamps stay in one session, ids stay dense") {
    val got = run(Seq(
      (1L, 0L, 1L), (1L, 0L, 0L), (1L, 0L, 2L), (1L, 50L, 3L)), gap = 10L)
    assert(got === Set((1L, 1L, 0L, 0L, 3L), (1L, 2L, 50L, 50L, 1L)))
  }

  test("byGap plan: single exchange (window partitioning reused by agg)") {
    val df = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = Sessionize.byGap(df, "user_id", "ts", "event_id",
      6L * 3600 * 1000000000L).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, plan)
  }

  test("byGap agrees with Spark's builtin session_window") {
    // same gap semantics as groupBy(session_window(...)): a session
    // window spans [first event, last event + gap); byGap additionally
    // numbers each key's sessions, which the builtin cannot. (Boundary
    // nuance: the builtin starts a new session at diff == gap, byGap
    // at diff > gap — no event pair in the committed table sits on the
    // exact-microsecond boundary, so the comparison is deterministic.)
    val gapUs = 6L * 3600 * 1000000L
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ev_ts", timestamp_micros($"ts_us"))
    val builtin = ev
      .groupBy(session_window($"ev_ts", "6 hours"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", unix_micros($"session_window.start").as("s"),
        unix_micros($"session_window.end").as("e"), $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val ours = Sessionize.byGap(ev, "user_id", "ts_us", "event_id", gapUs)
      .select($"user_id", $"session_start".as("s"),
        ($"session_end" + gapUs).as("e"), $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(ours === builtin)
  }

  test("byGap session count is monotone in shrinking gap") {
    val df = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val wide = Sessionize.byGap(df, "user_id", "ts", "event_id",
      24L * 3600 * 1000000000L).count()
    val narrow = Sessionize.byGap(df, "user_id", "ts", "event_id",
      1L * 3600 * 1000000000L).count()
    val users = df.select("user_id").distinct().count()
    val events = df.count()
    assert(wide >= users && narrow >= wide && events >= narrow)
  }
}
