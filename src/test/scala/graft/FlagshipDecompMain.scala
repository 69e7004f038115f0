package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r16 stage decomposition of the flagship annotate spine
  * (`gaf_pipeline_e2e`, and the dominant cost inside every runner merge
  * fill): time cumulative plan prefixes with the noop sink (guide §1.4)
  * so the marginal cost of each stage is visible — scan+QC, match
  * cascade, build+enrich, consolidation agg, final merge agg.
  *
  * Usage: Test/runMain graft.FlagshipDecompMain [sfDir] [reps]
  */
object FlagshipDecompMain {
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
    import graft.queries.GafE2eQueries

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"FLAGDECOMP $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }

    val d = sfDir
    val dims = GafE2eQueries.dims(spark, d)
    val cfg = GafE2eQueries.cfg
    (1 to reps).foreach { rep =>
      println(s"FLAGDECOMP --- rep $rep")
      val gaf = GafE2eQueries.gaf(spark, d)
      timed("scan_only")(noop(gaf))
      val filtered = AnnotationPipeline.qcTermFilters(
        AnnotationPipeline.filterSources(gaf, cfg.sources), dims)
      timed("scan_qc")(noop(filtered))
      val matched = AnnotationPipeline.matchGenes(filtered, dims,
        cfg.speciesTypeKey)
      timed("match")(noop(matched))
      val built = AnnotationPipeline.buildAnnotations(matched, dims, cfg)
      timed("build_fanout")(noop(built))
      val enriched = AnnotationPipeline.qcAndEnrich(built, dims, cfg)
      timed("enrich")(noop(enriched))
      val consolidated = graft.operators.Consolidator.consolidate(
        enriched.drop("_row_id", "_row_id2", "_prio"),
        AnnotationPipeline.consolidationKey, "with_info",
        Constants.WITH_INFO_CAP)
      timed("consolidate")(noop(consolidated))
      val full = GafE2eQueries.annotateE2e(spark, d)
      timed("full_annotate")(noop(full))
    }
    spark.stop()
  }
}
