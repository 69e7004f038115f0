package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Dev probe: per-stage wall of the sim_semdedup_text recipe at a
  * given sf dir (embed cache warm), to target the r8 "halve it" item.
  */
object SemdedupProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SDP $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val emb = t("embFill") {
      val e = graft.text.TextAnalysis.hashedEmbeddings(
          Tables.documents(spark, d), "doc_id", "text", dim = 64)
        .filter(exists($"embedding", v => v =!= 0.0f)).persist()
      e.count(); e
    }
    for (rep <- 1 to 2) {
      val stride = math.max(1, math.sqrt(emb.count().toDouble).toLong)
      val seeds = emb.filter(col("doc_id") % stride === 0)
        .select(col("doc_id").as("cent_id"), col("embedding").as("cent_vec"))
      val sample = graft.operators.Sampling.hashSample(
        emb.select(col("doc_id").as("c_id"), col("embedding").as("c_vec")),
        $"c_id", "8", "ivf")
      val centroids = t(s"train$rep")(
        Similarity.trainIvfCentroids(sample, seeds, iterations = 2))
      val assigned = Similarity.assignToCentroids(
        emb.select(col("doc_id").as("v_id"), col("embedding").as("v_vec")),
        centroids)
      t(s"assign$rep")(assigned.foreach(_ => ()))
      val pairs = Similarity.cosineNearDupPairs(
        assigned.withColumnRenamed("v_id", "id"), "id", "v_vec",
        0.995, block = Some("cent_id"))
      t(s"pairs$rep")(println("  npairs=" + pairs.count()))
      val comps = t(s"comps$rep")(
        graft.plans.ConnectedComponents.components(pairs))
      t(s"compsAct$rep")(comps.foreach(_ => ()))
      val sd = t(s"build$rep")(Similarity.semDedup(emb, "doc_id", "embedding",
        centroids, 0.995))
      t(s"dedup$rep")(sd.foreach(_ => ()))
    }
    spark.stop()
  }
}
