package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: stage decomposition of the annotate() spine at a given
  * fan-out factor — the r14 1000× regression hunt (Scale10xMain read
  * 1589s at HEAD vs the 767.8s r5 record on a quiet host; the 10× rung
  * reads 27.3s vs r7-end's committed 16.7s). Times CUMULATIVE counts
  * stage by stage, so stage cost ≈ the successive difference (modulo
  * codegen fusion differences at the cut points). Same session config
  * as Scale10xMain.
  */
object ScaleStageDecompMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // A/B knob for the ObjectHashAggregate sort-based fallback (the
    // default 128 makes every >128-groups-per-partition consolidate /
    // xref-merge partition degrade to a full-width sort; Bench pins
    // 262144 in its own session — the probe JVMs historically did NOT)
    sys.env.get("SPARK_GRAFT_OHA").foreach(v => builder.config(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.queries.GafE2eQueries._
    import graft.gaf.AnnotationPipeline._
    import graft.gaf.Constants._
    val dm = dims(spark, d)
    val gaf10 = gaf(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("db_reference",
        concat(col("db_reference"), lit("-"), col("_rep")))
      .drop("_rep")

    // warm at 1x, same as Scale10xMain
    annotate(gaf(spark, d), dm, cfg).count()

    graft.Tuning.autoShuffle(spark, graft.Tuning.estimatedBytes(gaf10))
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"STAGE $name%-14s rows=$n%10d cum=${(System.nanoTime()-t0)/1e9}%8.1fs")
    }
    val filtered = qcTermFilters(filterSources(gaf10, cfg.sources), dm)
    val matched = matchGenes(filtered, dm, cfg.speciesTypeKey)
    val built = buildAnnotations(matched, dm, cfg)
    val enriched = qcAndEnrich(built, dm, cfg)
    val consolidated = graft.operators.Consolidator.consolidate(
      enriched.drop("_row_id", "_row_id2", "_prio"),
      consolidationKey, "with_info", WITH_INFO_CAP)
    t("input")(gaf10)
    t("filtered")(filtered)
    t("matched")(matched)
    t("built")(built)
    t("enriched")(enriched)
    t("consolidated")(consolidated)
    t("merged")(graft.operators.AnnotMerge.merge(
      consolidated, mergeKey, "xref_source", "notes", XREF_SOURCE_CAP))
    spark.stop()
  }
}
