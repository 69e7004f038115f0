package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage walls of corpus_curate_increment_bloom at sf dir. */
object BloomCurateProbeMain {
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
      println(f"BCP $tag%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
    val batch = docs.filter(pmod($"doc_id", lit(3)) === 0)
    val bench = docs.filter(pmod($"doc_id", lit(50)) === 0)
    val cfg = graft.operators.Curate.CurateConfig(
      contaminationN = 3, maxContaminationFrac = 0.06)
    for (rep <- 1 to 2) {
      val n = t(s"count$rep")(hist.count())
      val idx = t(s"build$rep")(graft.dedup.BloomIndex.build(
        hist, "text", expectedItems = n, fpp = 0.001,
        k = cfg.minhashK, bands = cfg.bands))
      val fresh = graft.dedup.BloomIndex.classify(batch, idx, "text")
        .filter($"status" === "kept").drop("status")
      t(s"classify$rep")(fresh.count())
      val out = graft.operators.Curate.curate(fresh, bench,
        "doc_id", "text", cfg)
      t(s"curate$rep")(out.foreach(_ => ()))
    }
    spark.stop()
  }
}
