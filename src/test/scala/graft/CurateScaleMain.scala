package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: fan-out scale probe for the FULL `Curate.curate()`
  * composition — the LLM-pipeline flagship gets the same measured scale
  * treatment `annotate()` got at 1000x (round-5 verdict #1: its 100 TB
  * grade rested on a composition argument + a PlanSpec shuffle pin, not
  * measurement). One composed run per JVM, like Scale10xMain.
  *
  * Fans `documents` out `factor`x with CorpusScaleMain's construction
  * (replica-unique lead token, re-keyed ids — dup clusters grow with
  * the corpus, the realistic crawl shape), then drives ONE curate()
  * call: QC/repetition gates -> exact dedup -> LSH clustering (the
  * probe corpus's template family makes a mega-bucket by design) ->
  * contamination gate -> split -> per-split packing. The timed action
  * is the bench's full-row digest, so no stage can be pruned.
  *
  * This is also the test of `Tuning.autoShuffle`'s documented blind
  * spot: curate()'s shingle/band explodes fan data INSIDE the plan
  * where the scan-bytes estimate can't see it — the probe reports the
  * installed initial partition count next to the wall time so the
  * floor-covers-it claim is checked by measurement, not argument.
  *
  * Round-7 `full` mode runs the same probe with every statistical stage
  * enabled (hashed-BoW classifier gate, bigram-LM perplexity gate,
  * cross-document span dedup) at the thresholds CurateFullProbeMain
  * measured as non-vacuous — the r7 additions get the same measured
  * 1x/10x/100x treatment the classic composition got in r6. Classifier
  * training (driver-side, bounded) is timed separately: it's a one-time
  * model-build cost a deployment amortizes across runs, not per-corpus
  * work.
  *
  * Round-8 `semantic` mode: the classic composition plus the SemDeDup
  * stage (threshold 0.9, the harness corpus_curate_semantic operating
  * point) — embed + self-trained quantizer + within-cluster pair join
  * get the same measured fan-out treatment.
  *
  * Usage: Test/runMain graft.CurateScaleMain [sfDir] [factor]
  *        [classic|full|semantic]
  */
object CurateScaleMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val mode = args.drop(2).headOption.getOrElse("classic")
    require(Set("classic", "full", "semantic")(mode),
      s"unknown mode '$mode' (classic|full|semantic) — refusing to " +
        "silently record a classic run under a bogus label")
    val full = mode == "full"
    val semantic = mode == "semantic"
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // A/B override pins the AQE initial partition count too, else
    // curate()'s own autoShuffle would mask the manual baseline
    sys.env.get("SPARK_GRAFT_SHUFFLE").foreach(n => builder.config(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def spin(): Double = {
      val t0 = System.nanoTime(); var x = 0L; var i = 0
      while (i < 300000000) { x += i; i += 1 }
      if (x == 42L) println("?") // keep the loop un-eliminable
      (System.nanoTime() - t0) / 1e9
    }
    val one = spin()
    val many = {
      val t0 = System.nanoTime()
      val ts = (1 to 32).map(_ => new Thread(() => spin()))
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"CURATE_SCALE calib_1t=$one%.2fs calib_32t=$many%.2fs")

    // fan-out: replica docs are near-duplicates of each other (one
    // replica-unique lead token); repartition before persist so the
    // probe input has a real multi-partition layout, not one tiny file
    val par = spark.sparkContext.defaultParallelism
    val docs0 = Tables.documents(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_orig", $"doc_id")
      .withColumn("doc_id", $"doc_id" * factor + $"_rep")
      .withColumn("text", concat(lit("u"), $"doc_id", lit(" "), $"text"))
      .drop("_rep")
      .repartition(par)
      .persist()
    val nDocs = docs0.count()

    // same corpus split + config as the harness's corpus_curate_e2e
    // (contamination at n=3 / 0.06 is where the gate is non-vacuous on
    // this synthetic corpus); every replica of a bench doc is bench, so
    // the gate's dim grows with the corpus like a real eval suite would
    val benchMod = 50
    val train = docs0.filter(pmod($"_orig", lit(benchMod)) =!= 0).drop("_orig")
    val bench = docs0.filter(pmod($"_orig", lit(benchMod)) === 0).drop("_orig")

    val base = graft.operators.Curate.CurateConfig(
      contaminationN = 3, maxContaminationFrac = 0.06)
    // full mode: classifier threshold from CurateFullProbeMain's
    // measured distribution; the perplexity threshold is CALIBRATED at
    // p75 of the fanned corpus's own scores (pre-t0, the CCNet shape —
    // a fixed bits value tuned at 1x empties at 100x because add-one
    // unseen mass shifts every score up with vocabulary growth; first
    // probe attempt measured exactly that: 0 survivors at 10x)
    val thrBits = if (full) {
      val qcd = train.filter(
        graft.operators.Curate.qcPredicate($"text", base))
      val t = graft.text.NgramLm
        .perplexity(bench, qcd.select($"doc_id", $"text"), "doc_id", "text")
        .agg(expr("percentile(avg_nll, 0.75d)")).head().getDouble(0)
      println(f"CURATE_SCALE ppl_p75=$t%.3f")
      t
    } else 0.0
    val cfg =
      if (full) base.copy(maxPerplexityBits = thrBits,
        minQualityProb = 0.3, spanDedupN = Some(8))
      else if (semantic) base.copy(semDedupThreshold = Some(0.9))
      else base
    val model = if (full) {
      val tTrain = System.nanoTime()
      val m = graft.text.QualityClassifier.train(
        bench.withColumn("label",
          (graft.text.TextAnalysis.qualityScore($"text") >= 0.8)
            .cast("int")),
        "doc_id", "text", "label")
      println(f"CURATE_SCALE classifier_train=" +
        f"${(System.nanoTime - tTrain) / 1e9}%.1fs")
      Some(m)
    } else None

    val t0 = System.nanoTime()
    val out = graft.operators.Curate.curate(
      train, bench, "doc_id", "text", cfg,
      lmRef = if (full) Some(bench) else None,
      classifier = model)
    // bench-identical digest action: every output column materializes
    val dRow = out
      .select(xxhash64(struct(out.columns.map(col).toSeq: _*)).as("_h"))
      .agg(expr("bit_xor(_h)")).head()
    val digest = if (dRow.isNullAt(0)) 0L else dRow.getLong(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val keepers = out.count()
    val installed = spark.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum").orNull
    println(f"CURATE_SCALE mode=$mode " +
      f"factor=$factor in=$nDocs keepers=$keepers " +
      f"wall=$wall%.1fs rate=${nDocs / wall}%.0f docs/s " +
      f"initialPartitionNum=$installed digest=$digest%016x")
    graft.operators.Curate.clearManifests()
    spark.stop()
  }
}
