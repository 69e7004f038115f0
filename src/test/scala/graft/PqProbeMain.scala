package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.{Pq, Similarity}

/** PQ recall/determinism probe: recall@5 of the ADC scan vs the exact
  * brute-force ranker at a given sfDir, double-train determinism, and
  * compression accounting. Usage: PqProbeMain <sfDir> [m] [ksub].
  */
object PqProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val m = if (args.length > 1) args(1).toInt else 8
    val ksub = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val sample = graft.operators.Sampling.hashSample(corpus, $"c_id", "8", "pq")

    val t0 = System.nanoTime()
    val model = Pq.train(sample, "c_id", "c_vec", m, ksub, iterations = 2)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val model2 = Pq.train(sample, "c_id", "c_vec", m, ksub, iterations = 2)
    val deterministic = model.codebooks.zip(model2.codebooks)
      .forall { case (a, b) => java.util.Arrays.equals(a, b) }

    val encoded = Pq.encode(corpus, model).persist()
    val nEnc = encoded.count()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"q_id".cast("long"), $"c_id".cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, corpus, k = 5))
    val approx = pairs(Pq.topK(queries, encoded, model, k = 5))
    val recall = (exact & approx).size.toDouble / exact.size

    val untrained = {
      val seedModel = Pq.train(sample, "c_id", "c_vec", m, ksub, iterations = 0)
      val enc0 = Pq.encode(corpus, seedModel)
      val p = pairs(Pq.topK(queries, enc0, seedModel, k = 5))
      (exact & p).size.toDouble / exact.size
    }
    val refined = Seq(5, 10, 20).map { rf =>
      val p = pairs(Pq.topKRefined(queries, encoded, corpus, model, 5, rf))
      rf -> (exact & p).size.toDouble / exact.size
    }

    // IVFADC: coarse IVF centroids (the sim_ivf recipe) + residual PQ
    val ivfadc = {
      val stride = math.max(1,
        math.sqrt(corpus.count().toDouble).toLong)
      val seeds = emb.filter($"vec_id" % stride === 0)
        .select($"vec_id".as("cent_id"), $"embedding".as("cent_vec"))
      val cents = Similarity.trainIvfCentroids(sample, seeds, iterations = 2)
      val rModel = Pq.trainResidual(sample, cents, "c_id", "c_vec", m, ksub,
        iterations = 2)
      val index = Pq.ivfPqEncode(corpus, cents, rModel).persist()
      index.count()
      Seq((3, 10), (3, 20), (6, 20)).map { case (np, rf) =>
        val p = pairs(Pq.ivfPqTopK(queries, index, cents, corpus, rModel,
          k = 5, nProbe = np, rFactor = rf))
        (np, rf) -> (exact & p).size.toDouble / exact.size
      }
    }

    println(f"PQ_PROBE sf=$sfDir m=$m ksub=$ksub n=$nEnc " +
      f"train=${tTrain}%.2fs deterministic=$deterministic " +
      f"recall@5=${recall}%.3f untrained_recall=${untrained}%.3f " +
      refined.map { case (rf, r) => f"rerank_x$rf=${r}%.3f" }.mkString(" ") +
      " " +
      ivfadc.map { case ((np, rf), r) =>
        f"ivfadc_p${np}_x$rf=${r}%.3f" }.mkString(" ") +
      f" bytes_per_vec=${m * 4}(codes-as-int)+8(sqn) vs ${64 * 4}(float32)")
    spark.stop()
  }
}
