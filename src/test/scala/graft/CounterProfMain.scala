package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gaf._
import graft.operators._
import graft.queries.GafE2eQueries

object CounterProfMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $n%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s")
      r
    }
    val dims = GafE2eQueries.dims(spark, d)
    val gaf = GafE2eQueries.gaf(spark, d)
    val cfg = GafE2eQueries.cfg
    gaf.count()
    import AnnotationPipeline._
    val src = t("filterSources+persist") { val x = filterSources(gaf, cfg.sources).persist(); x.count(); x }
    val qc = t("qcTermFilters+persist") { val x = qcTermFilters(src, dims).persist(); x.count(); x }
    t("f4 count") { Audit.droppedNot4Curation(src, dims).count() }
    t("f5 count") { Audit.droppedCatalyticIpi(src, dims).count() }
    t("resolve any-species") { resolveGeneIds(dims, -1).count() }
    val matchedAny = t("matchGenes any") { matchGenes(qc, dims, cfg.speciesTypeKey, Some(resolveGeneIds(dims, -1))) }
    t("unmatched count") { qc.join(matchedAny.select(col("db"), col("db_object_id")).distinct(), Seq("db","db_object_id"), "left_anti").count() }
    t("inactive count") { Audit.inactive(qc, dims, cfg.speciesTypeKey).count() }
    val matched = t("matchGenes+persist") { val x = matchGenes(qc, dims, cfg.speciesTypeKey).persist(); x.count(); x }
    t("matchBy collect") { matched.groupBy(col("db")).count().collect() }
    t("noRatGene") { Audit.noRatGene(matched, dims, cfg).count() }
    val built = t("built+persist") { val x = buildAnnotations(matched, dims, cfg).persist(); x.count(); x }
    t("qc agg") { built.agg(count(when(col("evidence")==="ISO",1))).head() }
    t("unknownTerm") { built.join(broadcast(dims.ontTerms.select(col("term_acc"))), Seq("term_acc"), "left_anti").count() }
    val enriched = t("enriched+persist") { val x = qcAndEnrich(built, dims, cfg).persist(); x.count(); x }
    val consolidated = t("consolidated+persist") { val x = Consolidator.consolidate(enriched.drop("_row_id","_prio"), consolidationKey, "with_info", Constants.WITH_INFO_CAP).persist(); x.count(); x }
    t("keeper/lines-removed") {
      val mergeable = enriched.filter(length(coalesce(col("with_info"), lit(""))) > 0)
      val keepers = mergeable.groupBy(consolidationKey.map(col): _*).agg(min(col("_row_id")).as("_row_id")).select(col("_row_id")).distinct()
      val keptLines = enriched.filter(length(coalesce(col("with_info"), lit(""))) === 0).select(col("_row_id")).distinct().union(keepers).distinct()
      enriched.select(col("_row_id")).distinct().join(keptLines, Seq("_row_id"), "left_anti").count()
    }
    val mergedA2 = t("mergedA2+persist") { val x = AnnotMerge.merge(consolidated, mergeKey, "xref_source", "notes", Constants.XREF_SOURCE_CAP).persist(); x.count(); x }
    t("truncated") { mergedA2.count() - consolidated.dropDuplicates(mergeKey).count() }
    t("mergeSink") {
      val incoming = mergedA2
        .withColumn("full_annot_key", lit(null).cast("long"))
        .withColumn("created_date", lit(null).cast("timestamp"))
        .withColumn("last_modified_date", lit(null).cast("timestamp"))
        .withColumn("created_by", lit(cfg.createdBy))
        .withColumn("last_modified_by", lit(cfg.createdBy))
      val existing = spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](), Dims.fullAnnot)
      val m = MergeSink.merge(existing, incoming.select(existing.columns.map(col): _*), cfg.runTs, cfg.createdBy).persist()
      m.groupBy(col("_op")).count().collect()
    }
    spark.stop()
  }
}
