package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: time individual pieces at sf0.1 to find real hot spots. */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_OBJ_AGG_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warmup
    Tables.orders(spark, d).count()

    if (args.contains("a7")) {
      // a7_counter_dump cost vs the flagship (round-6 verdict item 2:
      // target dump <= ~1.5x flagship) — run flagship, then dump, warm
      import graft.queries.GafE2eQueries
      val dims = GafE2eQueries.dims(spark, d)
      val gaf = GafE2eQueries.gaf(spark, d)
      val cfg = GafE2eQueries.cfg
      gaf.count(); dims.rgdIds.count(); dims.xdb.count()
      val existing = spark.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](),
        graft.gaf.Dims.fullAnnot) // same empty-existing as a7_counter_dump
      for (round <- 1 to 2) {
        t(s"flagship annotate (pass $round)") {
          GafE2eQueries.annotateE2e(spark, d).count()
        }
        t(s"a7 counter dump (pass $round)") {
          graft.operators.Audit.pipelineCounters(gaf, dims, cfg, existing)
            .count()
        }
      }
      spark.stop(); return
    }

    if (args.contains("cons")) {
      // isolate the two merge aggregations from the upstream chain:
      // cache enriched, then time each downstream stage alone
      import graft.gaf._
      import graft.queries.GafE2eQueries
      val dims = GafE2eQueries.dims(spark, d)
      val gaf = GafE2eQueries.gaf(spark, d)
      val cfg = GafE2eQueries.cfg
      graft.Tuning.autoShuffle(spark, graft.Tuning.estimatedBytes(gaf))
      val enriched = AnnotationPipeline.qcAndEnrich(
        AnnotationPipeline.buildAnnotations(
          AnnotationPipeline.matchGenes(
            AnnotationPipeline.qcTermFilters(
              AnnotationPipeline.filterSources(gaf, cfg.sources), dims),
            dims, cfg.speciesTypeKey), dims, cfg), dims, cfg)
        .drop("_row_id", "_row_id2", "_prio").cache()
      t("enriched fill (cache)") { enriched.count() }
      for (p <- 1 to 2) {
        t(s"consolidate only (pass $p)") {
          graft.operators.Consolidator.consolidate(enriched,
            AnnotationPipeline.consolidationKey, "with_info",
            Constants.WITH_INFO_CAP).count()
        }
      }
      val consolidated = graft.operators.Consolidator.consolidate(enriched,
        AnnotationPipeline.consolidationKey, "with_info",
        Constants.WITH_INFO_CAP).cache()
      t("consolidated fill (cache)") { consolidated.count() }
      for (p <- 1 to 2) {
        t(s"annotMerge only (pass $p)") {
          graft.operators.AnnotMerge.merge(consolidated,
            AnnotationPipeline.mergeKey, "xref_source", "notes",
            Constants.XREF_SOURCE_CAP).count()
        }
      }
      spark.stop(); return
    }

    if (args.contains("e2e")) {
      import graft.gaf._
      import graft.queries.GafE2eQueries
      val dims = GafE2eQueries.dims(spark, d)
      val gaf = GafE2eQueries.gaf(spark, d)
      val cfg = GafE2eQueries.cfg
      // warm the dims + gaf scans so stage deltas are honest
      gaf.count(); dims.rgdIds.count(); dims.xdb.count()
      t("e2e 0: gaf scan only") { gaf.count() }
      val filtered = AnnotationPipeline.qcTermFilters(
        AnnotationPipeline.filterSources(gaf, cfg.sources), dims)
      t("e2e 1: +sources+qcTermFilters") { filtered.count() }
      val matched = AnnotationPipeline.matchGenes(filtered, dims, cfg.speciesTypeKey)
      t("e2e 2: +matchGenes") { matched.count() }
      val built = AnnotationPipeline.buildAnnotations(matched, dims, cfg)
      t("e2e 3: +buildAnnotations") { built.count() }
      val enriched = AnnotationPipeline.qcAndEnrich(built, dims, cfg)
      t("e2e 4: +qcAndEnrich") { enriched.count() }
      val consolidated = graft.operators.Consolidator.consolidate(
        enriched.drop("_row_id", "_row_id2", "_prio"),
        AnnotationPipeline.consolidationKey, "with_info", Constants.WITH_INFO_CAP)
      t("e2e 5: +consolidate") { consolidated.count() }
      t("e2e 6: full annotate") { GafE2eQueries.annotateE2e(spark, d).count() }
      t("e2e 6 again (warm)") { GafE2eQueries.annotateE2e(spark, d).count() }
      spark.stop(); return
    }

    val orders = Tables.orders(spark, d)
    t("groupBy count only") {
      orders.groupBy("o_orderkey").count().count()
    }
    t("tokenSetAgg builtin only") {
      orders.select($"o_orderkey", $"o_orderpriority".as("w"))
        .groupBy("o_orderkey")
        .agg(graft.operators.Consolidator.tokenSetAgg($"w").as("t")).count()
    }
    t("full consolidate (a5 shape)") {
      graft.operators.Consolidator.consolidate(
        orders.select($"o_orderkey", $"o_orderpriority".as("with_info")),
        Seq("o_orderkey"), "with_info", 1700).count()
    }
    t("a2 overflow merge (a2 shape)") {
      graft.operators.AnnotMerge.merge(
        orders.select($"o_custkey",
          concat(lit("REF:"), $"o_orderkey").as("xref_source"),
          lit(null).cast("string").as("notes")),
        Seq("o_custkey"), "xref_source", "notes", 60).count()
    }
    val docs = Tables.documents(spark, d)
    t("minhash signatures only") {
      docs.select($"doc_id",
        graft.dedup.Dedup.minhashSignature($"text", 16).as("sig")).count()
    }
    t("minhash bucket rows") {
      docs.select($"doc_id",
        explode(graft.dedup.Dedup.lshBandKeys(
          graft.dedup.Dedup.minhashSignature($"text", 16), 4, 4)).as("b")).count()
    }
    t("minhash candidates (pairs)") {
      graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text").count()
    }
    t("closure descendants j10") {
      val edges = Tables.part(spark, d)
        .select($"p_partkey".as("child"), expr("p_partkey div 2").as("parent"))
        .filter($"parent" >= 1)
      graft.plans.DagClosure.descendantsOf(edges, "parent", "child", lit(3L)).count()
    }
    spark.stop()
  }
}
