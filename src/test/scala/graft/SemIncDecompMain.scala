package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PqExprs.{pq_adc, pq_lut}

/** Decompose the factor-F semantic classify cost (r12): bucket-size
  * distribution of the built index, probe-pair volume, and ADC
  * candidate volume under the tie-inclusive cut vs the old row_number
  * cut — explains the classify growth SemIncScaleMain reports at
  * replica-crowded factors (every bucket holds ~F byte-equal codes, so
  * the tie groups the inclusive cut refuses to split are ~F wide).
  *
  * Usage: Test/runMain graft.similarity.SemIncDecompMain [sfDir] [factor]
  */
object SemIncDecompMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
    val histBase = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      .select($"doc_id", $"text")
    val batch = docs.filter(pmod($"doc_id", lit(3)) === 0)
      .select($"doc_id", $"text")
      .unionByName(histBase.filter(pmod($"doc_id", lit(10)) === 1)
        .select(($"doc_id" + 10000000L).as("doc_id"),
          concat($"text", lit(" rep0")).as("text")))
      .persist()
    val nBatch = batch.count()
    val hist = histBase
      .crossJoin(spark.range(factor).select($"id".as("_rep")))
      .select(($"doc_id" * factor + $"_rep" + 20000000L).as("doc_id"),
        concat($"text", lit(" rep"), $"_rep").as("text"))
      .persist()
    hist.count()
    var idx = graft.dedup.Dedup.semanticIndex(hist, "doc_id", "text")
    val codes = idx.codes.persist()
    val nCodes = codes.count()
    idx = idx.copy(codes = codes)

    val sizes = codes.groupBy($"cent_id").count()
      .agg(count(lit(1)).as("n_buckets"), min($"count").as("mn"),
        expr("percentile(count, 0.5)").as("p50"),
        expr("percentile(count, 0.9)").as("p90"),
        expr("percentile(count, 0.99)").as("p99"),
        max($"count").as("mx")).collect()(0)
    println(s"DECOMP factor=$factor codes=$nCodes " +
      s"buckets=${sizes.getLong(0)} min=${sizes.getLong(1)} " +
      s"p50=${sizes.getDouble(2)} p90=${sizes.getDouble(3)} " +
      s"p99=${sizes.getDouble(4)} max=${sizes.getLong(5)}")

    // replicate semanticStatus's retrieval stage (k=1, rFactor=20,
    // nProbe=3) to count scanned pairs and candidates under each cut
    val q = graft.text.TextAnalysis
      .hashedEmbeddings(batch, "doc_id", "text", idx.model.dim)
      .select($"doc_id".as("q_id"), $"embedding".as("q_vec"))
      .persist()
    q.count()
    val model = idx.model
    val cells = q
      .withColumn("_probe", explode_outer(slice(
        Similarity.centroidScores($"q_vec",
          Similarity.centroidLit(idx.centroids)), 1, 3)))
      .filter($"_probe".isNotNull)
      .select($"q_id", (-$"_probe.neg_id").as("cent_id"))
    val withOwn = idx.quantizer.ownCellProbe.fold(cells) { a =>
      cells.unionByName(
        a(q.select($"q_id".as("v_id"), $"q_vec".as("v_vec")))
          .select($"v_id".as("q_id"), $"cent_id")).distinct()
    }
    val probes = withOwn
      .join(q.select($"q_id",
        pq_lut($"q_vec", model.codebooks, model.ksub).as("_lut"),
        Similarity.norm($"q_vec").as("_qn"), $"q_vec"), Seq("q_id"))
      .join(broadcast(idx.centroids), Seq("cent_id"))
      .select($"q_id", $"cent_id", $"_lut",
        Similarity.dot($"q_vec", $"cent_vec").as("_qc"), $"_qn")
    val scored = codes.join(broadcast(probes), Seq("cent_id"))
      .filter($"q_id" =!= $"c_id")
      .withColumn("_den", $"_qn" * sqrt($"c_xsqn"))
      .withColumn("sim", round(
        when($"_den" > 0,
          ($"_qc" + pq_adc($"c_code", $"_lut")) / $"_den")
          .otherwise(lit(0.0)), 6))
      // drop the per-pair 2 KB lut copy BEFORE persisting 2.4M pairs
      .select($"q_id", $"c_id", $"sim")
      .persist()
    val nPairs = scored.count()
    val wTie = Window.partitionBy($"q_id").orderBy($"sim".desc)
    val wRn = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id")
    val candTie = scored.withColumn("r", rank().over(wTie))
      .filter($"r" <= 20).count()
    val candRn = scored.withColumn("r", row_number().over(wRn))
      .filter($"r" <= 20).count()
    println(f"DECOMP pairs_scanned=$nPairs pairs_per_doc=${
      nPairs.toDouble / nBatch}%.0f cand_tie=$candTie " +
      f"cand_rownum=$candRn cand_tie_per_doc=${
        candTie.toDouble / nBatch}%.1f")
    scored.unpersist()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def classify(): Unit =
      graft.dedup.Dedup.semanticStatus(batch, idx, "doc_id", "text")
        .select($"doc_id", $"status").foreach(_ => ())
    classify()
    val t = timed(classify())
    println(f"DECOMP classify=$t%.2f per_doc_ms=${t * 1000 / nBatch}%.2f")
    spark.stop()
  }
}
