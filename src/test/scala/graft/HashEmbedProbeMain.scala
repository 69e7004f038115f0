package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cost of the exploded text_hash_embed surface vs the
  * array form (r8 driver-sortable reshape). */
object HashEmbedProbeMain {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = graft.text.TextAnalysis.hashedEmbeddings(
      Tables.documents(spark, sf), "doc_id", "text", dim = 64)

    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.executedPlan // analyze
      val t0 = System.nanoTime()
      df.foreach(_ => ())
      println(f"$tag%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm
    base.foreach(_ => ())
    time("array")(base)
    time("array2")(base)
    val expl = base
      .select($"doc_id", posexplode($"embedding").as(Seq("i", "v")))
      .select($"doc_id", $"i".cast("long").as("i"), $"v")
    time("exploded")(expl)
    time("exploded2")(expl)
    val explOuter = base
      .select($"doc_id", posexplode_outer($"embedding").as(Seq("i", "v")))
      .select($"doc_id", $"i".cast("long").as("i"), $"v")
    time("outer")(explOuter)
    time("outer2")(explOuter)
    println("outer plan has Filter: " +
      explOuter.queryExecution.executedPlan.toString.contains("Filter"))
    spark.stop()
  }
}
