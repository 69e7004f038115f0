package graft
import org.apache.spark.sql.SparkSession
object IvfBenchMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    t("sim_bruteforce_topk") { qs("sim_bruteforce_topk")(spark, d).count() }
    t("sim_ivf_topk") { qs("sim_ivf_topk")(spark, d).count() }
    t("sim_lsh_topk") { qs("sim_lsh_topk")(spark, d).count() }
    spark.stop()
  }
}
