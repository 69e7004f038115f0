package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Scratch main: recall/scan grid for LSH configs vs brute force. */
object LshGridMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val corpus = emb.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, corpus, k = 5))
    for ((b, p) <- Seq((4, 0), (4, 2), (4, 4), (5, 3), (6, 3), (6, 6), (8, 8))) {
      val approx = pairs(Similarity.lshTopK(queries, corpus, 64, b, 5, p))
      val recall = (exact & approx).size.toDouble / exact.size
      println(f"LSHGRID nBits=$b nProbes=$p scan=${(1.0 + p) / (1 << b)}%.4f recall=$recall%.2f")
    }
    spark.stop()
  }
}
