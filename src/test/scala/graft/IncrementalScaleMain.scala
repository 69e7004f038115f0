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
  * Usage: Test/runMain graft.IncrementalScaleMain [sfDir] [factor] [exact|bloom]
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

    val bloom = args.drop(2).headOption.contains("bloom")
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
