package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: the driver's entry smoke (SparkEntry.entry rows > 0).
  * Exists because `sbt console` cannot run Spark code that needs runtime
  * reflection (typedLit/encoders) — the REPL classloader rejects the
  * java.sql bootstrap ("Prohibited package name"). Compiled runMain is
  * the reliable way to drive the same surface.
  */
object EntrySmokeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ENTRY_ROWS=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}
