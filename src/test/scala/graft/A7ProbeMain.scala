package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: flagship vs a7 dump timing with the CDBG stage trace
  * (GRAFT_COUNTER_DEBUG=1), to localize the residue keeping the a7/
  * flagship ratio above 1.5x in official rolls.
  */
object A7ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"A7P $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm both once, then alternate timed rolls
    time("warm_flagship") {
      SparkEntry.queries("gaf_pipeline_e2e")(spark, sfDir).count() }
    time("warm_a7") {
      SparkEntry.queries("a7_counter_dump")(spark, sfDir).count() }
    for (i <- 1 to 2) {
      time(s"flagship_$i") {
        SparkEntry.queries("gaf_pipeline_e2e")(spark, sfDir).count() }
      time(s"a7_$i") {
        SparkEntry.queries("a7_counter_dump")(spark, sfDir).count() }
    }
    spark.stop()
  }
}
