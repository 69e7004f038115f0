package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 decomposition probe: on the f100 semantic-build geometry, time
  * ONE fine-Lloyd means pass three ways — the r12 posexplode +
  * avg(decimal) + collect_list chain, the r13 one-pass
  * vec_decimal_mean aggregate, and (as a floor) a plain double-avg of
  * the same grouping — to attribute how much of the remaining
  * coarse/residual train wall is the means aggregation itself vs the
  * assignment work below it.
  *
  * Usage: VecMeanProbeMain [sfDir] [factor]
  */
object VecMeanProbeMain {
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
    val emb = graft.text.TextAnalysis.hashedEmbeddings(
        hist.filter(size(graft.functions.TokensExpr.tokens(
          coalesce($"text", lit(""))) ) > 0),
        "doc_id", "text", 64)
      .select($"doc_id".as("c_id"), $"embedding".as("c_vec"))
    // pre-assigned frame, localCheckpointed so every timed pass reads
    // the same materialized input (no shared lineage re-execution)
    val k = 577
    val seeds = emb.orderBy(xxhash64($"c_id"), $"c_id").limit(25)
      .select($"c_id".as("cent_id"), $"c_vec".as("cent_vec"))
    val cents = seeds.collect()
    val centsLocal = spark.createDataFrame(
      java.util.Arrays.asList(cents: _*), seeds.schema)
    val assigned = graft.similarity.Similarity
      .buildIvfIndex(emb, centsLocal)
      .select($"c_id".as("v_id"), $"c_vec".as("v_vec"), $"cent_id")
      .localCheckpoint()
    println(s"VECPROBE rows=${assigned.count()} k=$k")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"VECPROBE $name ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    (1 to 2).foreach { round =>
      timed(s"old_posexplode_chain_$round") {
        assigned
          .select($"cent_id", posexplode($"v_vec").as(Seq("pos", "x")))
          .groupBy($"cent_id", $"pos")
          .agg(avg($"x".cast("decimal(27,10)")).as("m"))
          .groupBy($"cent_id")
          .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
          .select($"cent_id",
            transform($"pm", p => p.getField("m").cast("double")).as("v"))
          .count()
      }
      timed(s"new_vec_decimal_mean_$round") {
        assigned.groupBy($"cent_id")
          .agg(graft.functions.VecDecimalMeanAgg
            .vec_decimal_mean($"v_vec").as("v"))
          .count()
      }
      timed(s"floor_double_avg_$round") {
        assigned
          .select($"cent_id", posexplode($"v_vec").as(Seq("pos", "x")))
          .groupBy($"cent_id", $"pos").agg(avg($"x").as("m"))
          .groupBy($"cent_id").agg(count(lit(1))).count()
      }
    }
    spark.stop()
  }
}
