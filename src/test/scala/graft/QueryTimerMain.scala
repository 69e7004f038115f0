package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: time a named query subset under Bench's exact session
  * config — warm invocation first, then N timed rolls each — to
  * localize single-row movements without paying the 135-query surface.
  *
  * Usage: <sfDir> <q1,q2,...> [rolls=3]
  * Prints one `QT <name> warm=<s> rolls=[s,s,s]` line per query.
  */
object QueryTimerMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val rolls = args.drop(2).headOption.map(_.toInt).getOrElse(3)
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
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      def roll(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = roll()
      val timed = (1 to rolls).map(_ => roll())
      println(f"QT $name warm=$warm%.3f rolls=[" +
        timed.map(t => f"$t%.3f").mkString(",") + "]")
    }
    spark.stop()
  }
}
