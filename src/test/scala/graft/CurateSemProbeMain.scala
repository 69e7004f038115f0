package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: survivor counts of the semantic curate stage across
  * thresholds, to pick a non-vacuous pinned operating point. */
object CurateSemProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val corpus = docs.filter(pmod($"doc_id", lit(50)) =!= 0)
    val bench = docs.filter(pmod($"doc_id", lit(50)) === 0)
    for (th <- Seq(None, Some(0.995), Some(0.95), Some(0.9), Some(0.8), Some(0.7))) {
      val n = graft.operators.Curate.curate(corpus, bench, "doc_id", "text",
        graft.operators.Curate.CurateConfig(
          contaminationN = 3, maxContaminationFrac = 0.06,
          semDedupThreshold = th)).count()
      println(s"CSP th=$th rows=$n")
    }
    spark.stop()
  }
}
