package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Scale probe for the two-level SemDeDup quantizer (round-9 verdict
  * item 3): demonstrate that
  *  - TOTAL centroids (coarseK * fineK) scale PAST the flat recipe's
  *    65536 driver-literal cap while the driver only ever holds coarseK
  *    coarse centroids, and
  *  - the largest (coarse, fine) CELL — the quadratic unit of the pair
  *    join — stays bounded near n / (coarseK * fineK) as n grows.
  *
  * Vectors are synthetic and deterministic (hash-derived uniform
  * floats, dim 8), so cluster geometry is reproducible run to run; the
  * threshold is set high enough that near-dup pairs are rare — the
  * probe measures partitioning and pair-join COST shape, while
  * correctness lives in the digest-pinned sim_semdedup_hier query and
  * ExtensionsSpec.
  *
  * Usage: [n1,n2,...] (default "50000,500000,2000000") [budgetBytes]
  *        [dim]
  * Prints one HIERSCALE line per n with coarseK, fineK, total
  * centroids, non-empty cells, max/mean cell size, sum of squared cell
  * sizes (the pair-join cost proxy), and wall seconds. A second arg
  * sets cellsBroadcastBytes — pass 0 to force the broadcast-hostile
  * shuffle-hash assignment (r10 fallback) and compare its wall against
  * the broadcast form at the same n. A third arg sets the synthetic
  * vector width (default 8) — at realistic embedding widths the cells
  * frame genuinely outgrows the default budget and the fallback fires
  * NATURALLY, measuring the crossover the budget knob is about.
  */
object SemdedupHierScaleMain {
  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("50000,500000,2000000")
      .split(",").map(_.trim.toLong)
    val budget = args.drop(1).headOption.map(_.toLong).getOrElse(64L << 20)
    val dimArg = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dim = dimArg
    ns.foreach { n =>
      // deterministic synthetic corpus: element j of vector id =
      // xxhash64(id, j) scaled to [0, 1)
      val vecs = spark.range(0, n, 1, 32)
        .select(col("id").as("vec_id"),
          array((0 until dim).map(j =>
            (pmod(xxhash64(col("id"), lit(j)), lit(1000000L)).cast("float")
              / 1000000.0f)): _*).as("embedding"))
        .persist()
      vecs.count()

      // target ~16 vectors per (coarse, fine) cell; past n ~ 1M*16 the
      // TOTAL centroid budget exceeds the flat 65536 cap — the regime
      // the flat recipe cannot partition
      val coarseK = math.min(2048L, math.max(16L, n / 4096)).toInt
      val fineK = math.max(1L, n / 16 / coarseK).toInt
      val t0 = System.nanoTime()
      val out = Similarity.semDedupHier(vecs, "vec_id", threshold = 0.9999,
        coarseK = coarseK, fineK = fineK, iterations = 1,
        cellsBroadcastBytes = budget)
      val cellHist = out.groupBy(col("cent_id")).count()
        .agg(count(lit(1)).as("cells"), max(col("count")).as("maxCell"),
          avg(col("count")).as("meanCell"),
          sum(col("count") * col("count")).as("sumSq"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      // the engine's OWN decision function — the label cannot drift
      // from the join strategy semDedupHier actually picked
      val cellsBytes = coarseK.toLong * fineK * dim * 8
      val form = if (Similarity.hierBroadcastsCells(coarseK, fineK, dim,
          budget)) "broadcast" else "shuffle-hash"
      println(f"HIERSCALE n=$n%d dim=$dim%d coarseK=$coarseK%d fineK=$fineK%d " +
        f"totalCents=${coarseK.toLong * fineK}%d cells=${cellHist.getLong(0)}%d " +
        f"maxCell=${cellHist.getLong(1)}%d meanCell=${cellHist.getDouble(2)}%.1f " +
        f"pairCostSumSq=${cellHist.getLong(3)}%d " +
        f"cellsMB=${cellsBytes / (1 << 20)}%d form=$form wall=$wall%.1f s")
      vecs.unpersist()
    }
    spark.stop()
  }
}
