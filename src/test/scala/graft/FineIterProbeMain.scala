package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r13 decomposition of ONE two-level fine-Lloyd iteration on the f100
  * semantic geometry: is the ~10s per iteration the broadcast cells
  * join, the fine argmax, the means aggregation, or the checkpoint?
  *
  * Usage: FineIterProbeMain [sfDir] [factor]
  */
object FineIterProbeMain {
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
      .select($"doc_id".as("c_id"), $"embedding".as("c_vec")).persist()
    val n = emb.count()
    // the sample the real build trains on
    val sample = graft.operators.Sampling.hashSample(emb, $"c_id", "8", "semidx")
    val vectors = sample.select($"c_id".as("v_id"), $"c_vec".as("v_vec"))
    val coarseK = 25; val fineK = 24
    val hashOrd = Seq(xxhash64($"v_id"), $"v_id")
    val seedW = Window.orderBy(hashOrd: _*)
    val coarseSeeds = vectors.orderBy(hashOrd: _*).limit(coarseK)
      .withColumn("cent_id", row_number().over(seedW).cast("long") - 1)
      .select($"cent_id", $"v_vec".as("cent_vec"))
    val coarse = graft.similarity.Similarity
      .trainIvfCentroids(vectors, coarseSeeds, iterations = 0,
        id = "v_id", vec = "v_vec")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"FINEIT $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val withCoarse = timed("assign_checkpoint")(
      graft.similarity.Similarity.assignToCentroids(vectors, coarse)
        .withColumnRenamed("cent_id", "coarse_id").localCheckpoint())
    println(s"FINEIT rows=${withCoarse.count()} n=$n")

    // REAL proportional quota allocation (trainTwoLevelCentroids)
    val kTot = coarseK.toLong * fineK
    val cellSizes = withCoarse.groupBy($"coarse_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val nTot = cellSizes.map(_._2).sum
    val floors = cellSizes.map { case (cid, c) =>
      (cid, kTot * c / nTot, kTot * c % nTot) }
    val give = (kTot - floors.map(_._2).sum).toInt
    val bonus = floors.sortBy { case (cid, _, rem) => (-rem, cid) }
      .take(math.max(0, give)).map(_._1).toSet
    val quota: Map[Long, Long] = floors.map { case (cid, f, _) =>
      cid -> math.max(1L, f + (if (bonus(cid)) 1L else 0L)) }.toMap
    println("FINEIT quotas=" + quota.toSeq.sortBy(-_._2).take(5) +
      " popTop=" + cellSizes.sortBy(-_._2).take(5).toSeq)
    val quotaCol = element_at(typedLit(quota), $"coarse_id")
    val cellW = Window.partitionBy($"coarse_id")
      .orderBy(xxhash64($"v_id"), $"v_id")
    val fine = timed("fine_seed")(withCoarse
      .withColumn("_rn", row_number().over(cellW))
      .filter($"_rn" <= quotaCol)
      .select($"coarse_id", ($"_rn" - 1).cast("long").as("fine_id"),
        transform($"v_vec", x => x.cast("double")).as("cent_vec"))
      .localCheckpoint())

    def fineCells = fine.groupBy($"coarse_id")
      .agg(array_sort(collect_list(struct($"fine_id", $"cent_vec")))
        .as("_cells"))

    (1 to 2).foreach { round =>
      timed(s"scan_only_$round")(withCoarse.count())
      timed(s"join_argmax_$round") {
        withCoarse.join(broadcast(fineCells), Seq("coarse_id"))
          .withColumn("fine_id", graft.functions.NearestInCellExpr
            .nearest_in_cell($"v_vec", $"_cells"))
          .select($"coarse_id", $"fine_id")
          .groupBy($"coarse_id", $"fine_id").count().count()
      }
      timed(s"join_argmax_vecmean_$round") {
        withCoarse.join(broadcast(fineCells), Seq("coarse_id"))
          .withColumn("fine_id", graft.functions.NearestInCellExpr
            .nearest_in_cell($"v_vec", $"_cells"))
          .groupBy($"coarse_id", $"fine_id")
          .agg(graft.functions.VecDecimalMeanAgg
            .vec_decimal_mean($"v_vec").as("v"))
          .count()
      }
      timed(s"join_argmax_doubleavg_$round") {
        withCoarse.join(broadcast(fineCells), Seq("coarse_id"))
          .withColumn("fine_id", graft.functions.NearestInCellExpr
            .nearest_in_cell($"v_vec", $"_cells"))
          .groupBy($"coarse_id", $"fine_id")
          .agg(avg(element_at($"v_vec", 1)).as("v"))
          .count()
      }
    }
    spark.stop()
  }
}
