package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: fan-out scale probe for the incremental-crawl dedup
  * family (`Dedup.dedupIndex` + `incrementalStatus`) — the r7 session-2
  * addition gets the same measured 1x/N x treatment every other family
  * has. Construction mirrors CorpusScaleMain (replica-unique lead
  * token, re-keyed ids): history = the fanned corpus, batch = a fresh
  * fan of the same base (so near-dup pressure against history grows
  * with the corpus, the realistic re-crawl shape) plus verbatim
  * re-crawls of every 10th history doc (exact-dup pressure).
  *
  * Timed separately:
  *  - index build (one-time per increment cycle; in deployment the
  *    index persists and only the NEW batch's rows append)
  *  - classify (the per-increment cost that must stay linear)
  *
  * `bloom` mode times the same classification on the Bloom fast path
  * (build = one treeAggregate pass, classify = map-only projection) so
  * the two regimes are directly comparable at each factor.
  *
  * `cycle` mode measures the full Bloom crawl-LOOP lifecycle instead
  * (r10): build sized to history+increment, fold the increment's kept
  * docs to exact saturation, REBUILD from the durable history at 2x
  * budget (the recovery path — its cost claim is "one pass, same as
  * build"), then prove the grown index still folds. One INC_CYCLE line
  * with per-phase walls.
  *
  * Usage: Test/runMain graft.IncrementalScaleMain [sfDir] [factor]
  *        [exact|bloom|cycle]
  */
object IncrementalScaleMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def spin(): Double = {
      val t0 = System.nanoTime(); var x = 0L; var i = 0
      while (i < 300000000) { x += i; i += 1 }
      if (x == 42L) println("?")
      (System.nanoTime() - t0) / 1e9
    }
    val one = spin()
    val many = {
      val t0 = System.nanoTime()
      val ts = (1 to 32).map(_ => new Thread(() => spin()))
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"INC_SCALE calib_1t=$one%.2fs calib_32t=$many%.2fs")

    val par = spark.sparkContext.defaultParallelism
    def fan(salt: String) = Tables.documents(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", $"doc_id" * factor + $"_rep")
      .withColumn("text",
        concat(lit(salt), $"doc_id", lit(" "), $"text"))
      .drop("_rep")
      .select($"doc_id", $"text")
      .repartition(par)
    val hist = fan("h").persist()
    val nHist = hist.count()
    val batch = fan("b")
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
      .unionByName(hist.filter(pmod($"doc_id", lit(10)) === 0)
        .select(($"doc_id" + 20000000L).as("doc_id"), $"text"))
      .repartition(par).persist()
    val nBatch = batch.count()

    val mode = args.drop(2).headOption.getOrElse("exact")
    if (mode == "cycle") {
      // phase 1: classify against a history-sized index to find the
      // increment's kept slice (deployment does this every batch)
      val t0 = System.nanoTime()
      val probe = graft.dedup.BloomIndex.build(hist, "text",
        expectedItems = nHist, fpp = 0.001, k = 16, bands = 2)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val kept = graft.dedup.BloomIndex.classify(batch, probe, "text")
        .filter($"status" === "kept").select($"doc_id", $"text")
        .repartition(par).persist()
      val nKept = kept.count()
      // phase 2: a loop-sized index folds the kept docs to EXACT
      // saturation — the state where the guard refuses further folds
      val full0 = graft.dedup.BloomIndex.build(hist, "text",
        expectedItems = nHist + nKept, fpp = 0.001, k = 16, bands = 2)
      val t1 = System.nanoTime()
      val full = graft.dedup.BloomIndex.fold(full0, kept, "text")
      val tFold = (System.nanoTime() - t1) / 1e9
      require(full.inserted == full.expectedItems, "not saturated")
      // phase 3: the recovery path — rebuild from the durable history
      // at 2x budget; claim: one pass over (hist + kept), same cost
      // class as the original build
      val t2 = System.nanoTime()
      val grown = graft.dedup.BloomIndex.rebuild(full,
        hist.unionByName(kept), "text",
        expectedItems = (nHist + nKept) * 2)
      val tRebuild = (System.nanoTime() - t2) / 1e9
      // phase 4: the loop continues — the grown index folds again
      // (texts carry unique salted ids, so every key is fresh)
      val more = batch.limit(1000)
        .select(($"doc_id" + 90000000L).as("doc_id"),
          concat(lit("x"), $"doc_id", $"text").as("text"))
      val t3 = System.nanoTime()
      val after = graft.dedup.BloomIndex.fold(grown, more, "text")
      val tFold2 = (System.nanoTime() - t3) / 1e9
      require(after.inserted > grown.inserted, "fold after rebuild failed")
      println(f"INC_CYCLE factor=$factor hist=$nHist kept=$nKept " +
        f"build=$tBuild%.1fs fold=$tFold%.1fs rebuild=$tRebuild%.1fs " +
        f"fold_after=$tFold2%.1fs " +
        f"bits=${grown.fp.bitSize() / 8 + grown.band.bitSize() / 8}B")
      spark.stop()
      return
    }
    val bloom = mode == "bloom"
    val (tIdx, idxSize, classified) = if (bloom) {
      val t0 = System.nanoTime()
      val idx = graft.dedup.BloomIndex.build(hist, "text",
        expectedItems = 3L * nHist, fpp = 0.001, k = 16, bands = 2)
      val tB = (System.nanoTime() - t0) / 1e9
      (tB, s"${idx.fp.bitSize() / 8 + idx.band.bitSize() / 8}B",
        graft.dedup.BloomIndex.classify(batch, idx, "text"))
    } else {
      val t0 = System.nanoTime()
      val idx = graft.dedup.Dedup
        .dedupIndex(hist, "doc_id", "text", k = 16, bands = 2).persist()
      val n = idx.count()
      val tB = (System.nanoTime() - t0) / 1e9
      (tB, s"${n}rows",
        graft.dedup.Dedup.incrementalStatus(batch, idx, "doc_id", "text",
          k = 16, bands = 2))
    }

    val t1 = System.nanoTime()
    val counts = classified
      .groupBy($"status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tCls = (System.nanoTime() - t1) / 1e9

    println(f"INC_SCALE mode=${if (bloom) "bloom" else "exact"} " +
      f"factor=$factor hist=$nHist batch=$nBatch " +
      f"index=$idxSize index_build=$tIdx%.1fs classify=$tCls%.1fs " +
      f"classify_rate=${nBatch / tCls}%.0f docs/s statuses=" +
      counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }
        .mkString(","))
    spark.stop()
  }
}
