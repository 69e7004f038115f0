package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: time a few individual harness queries in a fresh JVM
  * to separate environmental slowness from cumulative-session effects.
  * Usage: Test/runMain graft.QuickTimeMain [sfDir] [query ...]
  */
object QuickTimeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s3_demux_routing", "p6_conditional_append", "s4_species_prefilter")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, d).count()
      println(f"QT $n rep=$rep rows=$c wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
