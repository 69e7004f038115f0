package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{Pq, Similarity}

/** PQ scan throughput at fanned-out corpus sizes: replicate the
  * embeddings corpus `factor`x (replica-unique ids), encode ONCE, then
  * time exhaustive brute-force cosine vs ADC retrieve+rerank vs int8
  * over the same 10-query set. Usage: PqScaleMain <sfDir> <factor...>.
  *
  * The claim under test is the SCAN ECONOMY, not wall-clock magic at
  * toy sizes: ADC does m=16 lookups per pair where brute does 64 mults
  * + 2 norms, and the candidate re-rank touches |Q|*k*rFactor float
  * rows regardless of corpus size. Walls are steady-state (one warm
  * roll, then the timed roll).
  */
object PqScaleMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir)
    val n0 = emb.count()
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val sample = graft.operators.Sampling.hashSample(
      emb.select($"vec_id".as("c_id"), $"embedding".as("c_vec")),
      $"c_id", "8", "pq")
    val model = Pq.train(sample, "c_id", "c_vec", m = 16, ksub = 16,
      iterations = 2)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    factors.foreach { factor =>
      val corpus = emb
        .crossJoin(spark.range(factor).select($"id".as("_rep")))
        .select(($"vec_id" * factor + $"_rep").as("c_id"),
          $"embedding".as("c_vec"))
        .persist()
      val n = corpus.count()
      val encoded = Pq.encode(corpus, model).persist()
      val tEncode = timed(encoded.foreach(_ => ()))

      def roll(df: => DataFrame): Double = {
        df.foreach(_ => ()) // warm
        timed(df.foreach(_ => ()))
      }
      val tBrute = roll(Similarity.bruteForceTopK(queries, corpus, k = 5))
      val tInt8 = roll(Similarity.int8TopK(queries, corpus, k = 5))
      val tAdc = roll(Pq.topKRefined(queries, encoded, corpus, model,
        k = 5, rFactor = 20))
      println(f"PQ_SCALE sf=$sfDir factor=$factor n=$n (base=$n0) " +
        f"encode=${tEncode}%.2fs brute=${tBrute}%.2fs int8=${tInt8}%.2fs " +
        f"pq_rerank=${tAdc}%.2fs " +
        f"pairs=${n * 10}%d pq_pairs_per_s=${n * 10 / tAdc}%.0f")
      encoded.unpersist()
      corpus.unpersist()
    }
    spark.stop()
  }
}
