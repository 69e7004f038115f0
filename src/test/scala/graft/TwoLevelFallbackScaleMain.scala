package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Scale probe for the r15 DISTRIBUTED two-level fallback: geometry
  * PAST the 65536 literal-expression ceiling (the flat recipe's hard
  * cap, and previously a loud refusal in `trainTwoLevelCentroids`)
  * must now train and assign end-to-end with the fine level held as a
  * frame — nothing quantizer-sized ever materializes on the driver.
  *
  * Synthesizes n deterministic pseudo-random vectors (id-hash derived,
  * no RNG state), trains coarseK x fineK = 131,072 fine centroids
  * (2x the literal cap), assigns the full corpus through the
  * shuffle-hash join path, and reports train/assign walls plus the
  * bucket-shape stats a capacity plan wants (cells hit, max/mean
  * bucket). Numbers land in BASELINE.md r15.
  *
  * Run: sbt "Test/runMain graft.TwoLevelFallbackScaleMain [n] [dim]"
  */
object TwoLevelFallbackScaleMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val coarseK = 512
    val fineK = 256 // 512*256 = 131,072 fine centroids — 2x the cap
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.range(n.toLong)
      .select(col("id").as("c_id"),
        transform(sequence(lit(1), lit(dim)), j =>
          (pmod(xxhash64(col("id"), j), lit(1000L)).cast("double")
            / 500.0 - 1.0)).as("c_vec"))
      .localCheckpoint()
    emb.count()

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TLFB $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val tl = timed("train")(Similarity.trainTwoLevelCentroids(
      emb, coarseK = coarseK, fineK = fineK, iterations = 2))
    require(!tl.literalOk, "geometry past the cap must take the fallback")
    val fineCount = tl.fine.count()
    println(s"TLFB fine_centroids=$fineCount (cap 65536) " +
      s"literalOk=${tl.literalOk} stride=${tl.fineK}")

    val vs = emb.select(col("c_id").as("v_id"), col("c_vec").as("v_vec"))
    val asg = timed("assign")(
      Similarity.assignTwoLevel(vs, tl).localCheckpoint())
    val total = asg.count()
    require(total == n.toLong,
      s"assignment dropped rows: $total of $n (inner-join miss?)")
    val shape = asg.groupBy(col("cent_id")).count()
      .agg(count(lit(1)).as("cells"), max(col("count")).as("maxB"),
        avg(col("count")).as("meanB"))
      .head()
    println(f"TLFB assigned=$total cells_hit=${shape.getLong(0)} " +
      f"max_bucket=${shape.getLong(1)} mean_bucket=${shape.getDouble(2)}%.1f")

    // r16: the WHOLE classify path at past-cap geometry — the advisor's
    // r15 finding was that only assignment routed distributed; residual
    // training, the corpus encode, probe selection, the ADC search and
    // the drift probe all still collected/broadcast the 131k-row flat
    // fine table. Exercise every one of them through the literalCents
    // routing and prove exact re-find: queries are corpus vectors under
    // shifted ids, so each one's top-1 must be its own source vector at
    // sim 1.0 (own-cell probing guarantees the bucket is probed; the
    // exact re-rank guarantees the duplicate wins).
    import graft.similarity.Pq
    val quant = Similarity.TwoLevelCoarse(tl)
    require(!quant.literalCents)
    val asgFrame = asg.select(col("v_id").as("c_id"),
      col("v_vec").as("c_vec"), col("cent_id"))
    val sample = asgFrame.filter(pmod(xxhash64(col("c_id")), lit(16)) === 0)
    val model = timed("pq_train")(Pq.trainResidualAssigned(
      sample, quant.centroids, m = 8, ksub = 16, iterations = 1,
      broadcastCents = false))
    val index = timed("encode")(Pq.ivfPqEncodeAssigned(
        asgFrame, quant.centroids, model, broadcastCents = false)
      .localCheckpoint())
    require(index.count() == n.toLong, "encode dropped rows")
    val nQ = 1000
    val queries = emb.filter(col("c_id") < nQ)
      .select((col("c_id") + n).as("q_id"), col("c_vec").as("q_vec"))
    val corpus = emb.select(col("c_id"), col("c_vec"))
    val hits = timed("search")(Pq.ivfPqTopK(queries, index,
        quant.centroids, corpus, model, k = 5, nProbe = 8,
        broadcastProbes = true, ownCellAssign = quant.ownCellProbe,
        probeSelect = Some(quant.probeTop _), broadcastCents = false)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("c_id"), col("sim"))
      .collect())
    val exact = hits.count(r =>
      r.getLong(1) == r.getLong(0) - n && r.getDouble(2) == 1.0)
    println(s"TLFB search top1_exact=$exact/$nQ")
    require(exact == nQ,
      s"exact re-find failed past the cap: $exact of $nQ")
    val drift = timed("drift")(graft.dedup.Dedup.semanticDriftEncoded(
      index.join(corpus, Seq("c_id")).select(col("cent_id"), col("c_vec")),
      quant.centroids, broadcastCents = false))
    println(f"TLFB drift rows=${drift.rows} " +
      f"meanAssignCos=${drift.meanAssignCos}%.4f " +
      f"topShare=${drift.topShare}%.4f cells=${drift.cells}")
    println("TLFB PASS: past-cap geometry trained, assigned, PQ-trained, " +
      "encoded, searched (1000/1000 exact re-find) and drift-probed " +
      "distributed end-to-end — nothing quantizer-sized on the driver")
    spark.stop()
  }
}
