package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch main: verify the asof-join probe actually executes the
  * window (the bare-count form was optimizer-prunable) and time it
  * honestly at a given fan-out factor.
  */
object AsofProfMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = Tables.events(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("user_id", $"user_id" * factor + $"_rep")
      .withColumn("event_id", $"event_id" * factor + $"_rep")
      .drop("_rep")
      .persist()
    println(s"AP events=${events.count()} parts=${events.rdd.getNumPartitions}")
    val sessions = graft.operators.Sessionize
      .byGap(events, "user_id", "ts", "event_id", 6L * 3600 * 1000000000L)
      .select($"user_id", $"session_id", $"session_start".as("s_ts"))
      .persist()
    println(s"AP sessions=${sessions.count()} parts=${sessions.rdd.getNumPartitions}")

    val joined = graft.operators.AsOfJoin.asOf(
      events.select($"event_id", $"user_id", $"ts"),
      sessions, key = "user_id", leftTs = "ts", rightTs = "s_ts",
      payload = Seq("session_id"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = f
      println(f"AP $name v=$v wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    time("agg_count") { joined.agg(count($"session_id")).head().getLong(0) }
    time("agg_sum") {
      joined.agg(sum($"session_id".cast("long"))).head().getLong(0) }
    joined.agg(count($"session_id")).explain("formatted")
    spark.stop()
  }
}
