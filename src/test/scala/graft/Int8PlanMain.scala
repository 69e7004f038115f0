package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** One-off: print the int8TopK physical plan to check whether the
  * corpus-side quantization projection survives below the join or
  * re-inlines per pair.
  */
object Int8PlanMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val corpus = emb.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val plan = Similarity.int8TopK(queries, corpus, k = 5)
      .queryExecution.executedPlan.toString
    println("INT8_PLAN_BEGIN")
    println(plan.take(12000))
    println("INT8_PLAN_END")
    spark.stop()
  }
}
