package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split of the semantic index BUILD at a replica factor (r12):
  * embed+persist, coarse quantizer training (two-level above the
  * threshold), residual-PQ training, full-history encode. Mirrors
  * Dedup.semanticIndex's exact steps so the split attributes the real
  * build wall — the lever table for future build work.
  *
  * Usage: SemBuildProfMain [sfDir] [factor]
  */
object SemBuildProfMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
    val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      .select($"doc_id", $"text")
      .crossJoin(spark.range(factor).select($"id".as("_rep")))
      .select(($"doc_id" * factor + $"_rep" + 20000000L).as("doc_id"),
        concat($"text", lit(" rep"), $"_rep").as("text"))
      .persist()
    hist.count()

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SEMBUILD $name ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    import graft.similarity.{Pq, Similarity}
    import graft.functions.TokensExpr.tokens
    val embSrc = graft.text.TextAnalysis.hashedEmbeddings(
        hist.filter(size(tokens(coalesce($"text", lit("")))) > 0),
        "doc_id", "text", 64)
      .select($"doc_id".as("c_id"), $"embedding".as("c_vec"))
    val emb = embSrc.persist()
    val n = timed("embed_persist_count")(emb.count())
    require(n > graft.dedup.Dedup.SemanticHierThreshold,
      s"SemBuildProfMain profiles the TWO-LEVEL build path; n=$n is " +
        s"under the ${graft.dedup.Dedup.SemanticHierThreshold} " +
        "threshold where production takes the flat Lloyd — raise the " +
        "factor so the split measures the build that actually runs")
    val k = math.max(1, math.sqrt(n.toDouble).toInt)
    val ksubEff = math.min(16L, n).toInt
    val half = graft.operators.Sampling.hashSample(emb, $"c_id", "8", "semidx")
    val sample = if (half.count() >= ksubEff.toLong) half else emb
    val coarseK = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val fineK = math.max(1, math.ceil(k.toDouble / coarseK).toInt)
    val tl = timed(s"coarse_train_2level(coarseK=$coarseK,fineK=$fineK)")(
      Similarity.trainTwoLevelCentroids(sample, coarseK, fineK,
        iterations = 2))
    val centroids = tl.flat
    def assigned(src: org.apache.spark.sql.DataFrame) =
      Similarity.assignTwoLevel(
          src.select($"c_id".as("v_id"), $"c_vec".as("v_vec")), tl)
        .select($"v_id".as("c_id"), $"v_vec".as("c_vec"), $"cent_id")
    val model = timed("residual_pq_train")(
      Pq.trainResidualAssigned(assigned(sample), centroids, 16, ksubEff,
        iterations = 2))
    val codes = Pq.ivfPqEncodeAssigned(assigned(emb), centroids, model)
      .persist()
    timed("full_encode")(codes.count())
    println(s"SEMBUILD n=$n k=$k")
    spark.stop()
  }
}
