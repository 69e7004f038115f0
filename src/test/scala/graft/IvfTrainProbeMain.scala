package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Scratch main: recall@k of IVF probe with untrained seed centroids vs
  * Lloyd-trained centroids, at equal nProbe (round-5 quantizer training).
  */
object IvfTrainProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.embeddings(spark, d)
    val corpus = emb.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val queries = emb.filter($"vec_id" < 25)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val stride = math.max(1, math.sqrt(emb.count().toDouble).toLong)
    val seeds = emb.filter($"vec_id" % stride === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("cent_vec"))
    val sample = graft.operators.Sampling.hashSample(corpus, $"c_id", "8", "ivf")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    for (k <- Seq(5, 10); nProbe <- Seq(2, 3)) {
      val exact = pairs(Similarity.bruteForceTopK(queries, corpus, k))
      def recall(cents: org.apache.spark.sql.DataFrame): Double = {
        val got = pairs(Similarity.ivfTopK(queries, corpus, cents, k, nProbe))
        (exact & got).size.toDouble / exact.size
      }
      val r0 = recall(seeds)
      val rs = (1 to 3).map(it =>
        recall(Similarity.trainIvfCentroids(sample, seeds, it)))
      println(f"IVFTRAIN k=$k nProbe=$nProbe untrained=$r0%.3f " +
        rs.zipWithIndex.map { case (r, i) => f"iter${i + 1}=$r%.3f" }
          .mkString(" "))
    }
    spark.stop()
  }
}
