package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Semantic-increment probe: status counts, re-crawl catch rate, and
  * the kept/sem_hist sim distribution at a given sfDir.
  */
object SemIncProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = SparkEntry.queries("dedup_incremental_semantic")(spark, sfDir)
      .persist()
    val counts = out.groupBy($"status").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    // re-crawls carry ids >= 100000 and MUST be sem_hist with sim=1.0
    val recrawl = out.filter($"doc_id" >= 100000)
    val nRe = recrawl.count()
    val nReCaught = recrawl.filter($"status" === "sem_hist" &&
      $"best_sim" === 1.0).count()
    val simStats = out.agg(
      round(min($"best_sim"), 3), round(avg($"best_sim"), 3),
      round(max($"best_sim"), 3)).head()
    println(s"SEMINC sf=$sfDir $counts recrawl=$nRe caught=$nReCaught " +
      s"sim(min/avg/max)=${simStats.get(0)}/${simStats.get(1)}/${simStats.get(2)}")
    out.unpersist()
    spark.stop()
  }
}
