package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 decomposition of ONE runner merge fill (the human species of
  * gaf_runner_multispecies — the bench board's #1 row): time cumulative
  * plan prefixes with the noop sink (guide §1.4) so the marginal cost
  * of each layer is visible — the incoming annotate spine, the
  * full-outer classify join, the surrogate-key window, the observed
  * scope-marker joins, and finally the Snapshot.materialize storage
  * write the runner actually pays.
  *
  * Usage: Test/runMain graft.RunnerFillDecompMain [sfDir] [reps]
  */
object RunnerFillDecompMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.gaf._
    import graft.operators.MergeSink
    import graft.queries.GafE2eQueries

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"RUNDECOMP $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }

    val runTs = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
    // the runner fixtures (augmented dims + seeded existing table) via
    // the same memoized accessor the bench row uses
    val m = GafE2eQueries.getClass.getDeclaredMethods
      .find(_.getName == "runnerFixtures").get
    m.setAccessible(true)
    val (dimsAug, existing) = m.invoke(GafE2eQueries, spark, sfDir)
      .asInstanceOf[(Dimensions, DataFrame)]
    val cfg = GafE2eQueries.cfg.copy(runTs = runTs)
    val gaf = GafE2eQueries.gaf(spark, sfDir, sliceMod = 4)
    val cols = existing.columns.toSeq

    (1 to reps).foreach { rep =>
      println(s"RUNDECOMP --- rep $rep (existing=${existing.count()} rows)")
      var incoming: DataFrame = null
      timed("build_filtered") {
        val f = AnnotationPipeline.qcTermFilters(
          AnnotationPipeline.filterSources(gaf, cfg.sources), dimsAug)
        incoming = f
      }
      timed("build_matched") {
        incoming = AnnotationPipeline.matchGenes(incoming, dimsAug,
          cfg.speciesTypeKey)
      }
      timed("build_enriched") {
        incoming = AnnotationPipeline.qcAndEnrich(
          AnnotationPipeline.buildAnnotations(incoming, dimsAug, cfg),
          dimsAug, cfg)
      }
      timed("build_consolidated") {
        incoming = graft.operators.Consolidator.consolidate(
          incoming.drop("_row_id", "_row_id2", "_prio"),
          AnnotationPipeline.consolidationKey, "with_info",
          Constants.WITH_INFO_CAP)
      }
      timed("build_a2_incoming") {
        val merged = graft.operators.AnnotMerge.merge(incoming,
          AnnotationPipeline.mergeKey, "xref_source", "notes",
          Constants.XREF_SOURCE_CAP)
        incoming = merged
          .withColumn("full_annot_key", lit(null).cast("long"))
          .withColumn("created_date", lit(null).cast("timestamp"))
          .withColumn("last_modified_date", lit(null).cast("timestamp"))
          .withColumn("created_by", lit(cfg.createdBy))
          .withColumn("last_modified_by", lit(cfg.createdBy))
          .select(cols.map(col): _*)
      }
      timed("incoming_annotate")(noop(incoming))
      timed("merge_nokeys")(noop(
        MergeSink.merge(existing, incoming, runTs, cfg.createdBy,
          assignKeys = false)))
      val merged = MergeSink.merge(existing, incoming, runTs, cfg.createdBy)
      timed("merge_keys")(noop(merged))
      // the runner's observed form: one scope marker join + the fused
      // metrics (abbreviated: op counts + maxKey)
      val scope = dimsAug.rgdIds
        .filter(col("species_type_key") === Constants.HUMAN &&
          col("object_status") === "ACTIVE")
        .select(col("rgd_id").as("_m_0")).distinct()
      val obs = org.apache.spark.sql.Observation()
      val observed = merged
        .join(broadcast(scope),
          col("annotated_object_rgd_id") === col("_m_0"), "left")
        .observe(obs,
          count(when(col("_op") === "insert", 1)).as("op_insert"),
          coalesce(max(col("full_annot_key")), lit(0L)).as("maxKey"))
        .drop("_m_0")
      timed("merge_keys_observed")(noop(observed))
      timed("fill_materialize") {
        val s = graft.plans.Snapshot.materialize(observed)
        s.release()
      }
      if (rep == 1 && args.contains("explain")) {
        java.nio.file.Files.write(
          java.nio.file.Paths.get("plans/r17/runner_human_fill_probe.txt"),
          observed.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode
              .fromString("formatted")).getBytes("UTF-8"))
        println("RUNDECOMP wrote plans/r17/runner_human_fill_probe.txt")
      }
    }
    spark.stop()
  }
}
