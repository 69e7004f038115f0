package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch main: stage-by-stage timing of minhashCandidates on the
  * CorpusScaleMain fan-out, to localize the superlinear wall seen at
  * factor 20 (125s for 100k docs vs 0.8s for 5k).
  */
object MinhashProfMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", $"doc_id" * factor + $"_rep")
      .withColumn("text", concat(lit("u"), $"doc_id", lit(" "), $"text"))
      .drop("_rep")
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    println(s"PROF fanout n=${docs.count()} parts=${docs.rdd.getNumPartitions}")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val k = 16; val bands = 4; val rpb = k / bands
    val base = Tables.spread(docs.select($"doc_id".as("id"), $"text".as("t")))
      .filter(size(graft.functions.TokensExpr.tokens($"t")) > 0)
    val sig = base.select($"id", dedup.Dedup.minhashSignature($"t", k).as("sig"))
    time("sig_pass") { sig.count() }
    time("sig_pass_warm") { sig.count() }

    val keyed = sig
      .select($"id", $"sig", explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select($"id", dedup.Dedup.bandKey($"sig", $"band", rpb).as("bucket"))
    time("keyed") { keyed.count() }

    val edges = keyed
      .withColumn("rep", min($"id").over(Window.partitionBy($"bucket")))
      .filter($"id" =!= $"rep")
      .select($"rep".as("id_a"), $"id".as("id_b"))
    time("window_edges") { edges.count() }
    time("distinct") { edges.distinct().count() }

    // alternative star-edge build: partial-aggregated min + join back —
    // map-side combinable and AQE-skew-splittable where the window form
    // serializes the mega-bucket into one sort partition
    val reps = keyed.groupBy($"bucket").agg(min($"id").as("rep"))
    val edges2 = keyed.join(reps, "bucket")
      .filter($"id" =!= $"rep")
      .select($"rep".as("id_a"), $"id".as("id_b"))
    time("aggjoin_edges") { edges2.count() }
    time("aggjoin_distinct") { edges2.distinct().count() }
    time("aggjoin_distinct_warm") { edges2.distinct().count() }
    time("full_op") { dedup.Dedup.minhashCandidates(docs, "doc_id", "text").count() }
    // bucket-size distribution: is there a mega-bucket?
    val dist = keyed.groupBy("bucket").count()
      .agg(max($"count").as("max_b"), expr("approx_percentile(count, 0.999)").as("p999"),
        count(lit(1)).as("n_buckets")).collect()(0)
    println(s"PROF buckets max=${dist.get(0)} p999=${dist.get(1)} n=${dist.get(2)}")
    spark.stop()
  }
}
