package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: time named registered queries (warm + timed pass) at a
  * given sf dir. Usage: IvfBenchMain <sfDir> [queryName...]; defaults to
  * the ANN trio.
  */
object IvfBenchMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("sim_bruteforce_topk", "sim_ivf_topk", "sim_lsh_topk")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $n%-24s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$r")
    }
    val qs = SparkEntry.queries
    names.foreach(n => t(n) { qs(n)(spark, d).count() })
    spark.stop()
  }
}
