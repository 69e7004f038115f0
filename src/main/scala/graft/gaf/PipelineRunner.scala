package graft.gaf

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gaf.Constants._
import graft.operators.MergeSink
import graft.operators.MergeSink.StaleReport

/** Full-run orchestration (GoNonratAnnotationPipeline.run, §3.1/§3.3):
  * per-species merge + stale delete, with the two cross-species ordering
  * constraints made explicit:
  *
  *  1. chinchilla runs LAST so every rat-ISO annotation derived from the
  *     other species has been touched before the ISO stale delete
  *     (GoNonratAnnotationPipeline.java:114);
  *  2. the rat-ISO stale delete compares against the count snapshot taken
  *     BEFORE any species ran (U5, :124-125,314-325).
  *
  * Everything here is driver-side control flow around cluster-side plans —
  * scalar counts and branch decisions, exactly like the reference's
  * threshold brake.
  */
object PipelineRunner {

  final case class SpeciesRun(name: String, gaf: DataFrame, cfg: PipelineConfig)

  final case class RunReport(
      species: Seq[(String, Map[String, Long], StaleReport)],
      isoStale: Option[StaleReport],
      finalTable: DataFrame)

  /** Scoped count for (ref, species) via the active-object semi-join (A8,
    * DAO.java:86-88).
    */
  def refSpeciesCount(table: DataFrame, rgdIds: DataFrame, refRgdId: Int,
                      speciesTypeKey: Int): Long =
    table.filter(col("ref_rgd_id") === refRgdId)
      .join(broadcast(rgdIds
          .filter(col("species_type_key") === speciesTypeKey &&
            col("object_status") === "ACTIVE").select("rgd_id")),
        col("annotated_object_rgd_id") === col("rgd_id"), "left_semi")
      .count()

  /** Run every species in order (caller puts chinchilla last), then the
    * rat-ISO stale delete against the time-zero snapshot.
    *
    * @param staleCutoff rows last modified before this are delete
    *                    candidates (run start − 10 min in the reference,
    *                    GoNonratAnnotationPipeline.java:98)
    */
  def runAll(existing: DataFrame, dims: Dimensions, runs: Seq[SpeciesRun],
             isoRefRgdId: Int, staleCutoff: Timestamp,
             thresholdPct: Double = DELETE_THRESHOLD_PCT): RunReport = {
    // U5 snapshot BEFORE any species runs
    val isoInitial = refSpeciesCount(existing, dims.rgdIds, isoRefRgdId, RAT)

    var table = existing
    var prevCached: Seq[DataFrame] = Nil
    val perSpecies = runs.map { r =>
      val initial = refSpeciesCount(table, dims.rgdIds, r.cfg.refRgdId,
        r.cfg.speciesTypeKey)
      // cache the merged table ONCE: the op counts, the stale-delete
      // scans, and the next species' lineage all reuse it (the merge's
      // full-outer join must not re-execute per downstream action)
      val merged = AnnotationPipeline.run(r.gaf, table, dims, r.cfg).cache()
      val ops = merged.groupBy("_op").count().collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      val next = merged.drop("_op")
      val (afterDelete, report) =
        if (r.cfg.refRgdId == 0) (next, StaleReport(0, 0, aborted = false))
        else MergeSink.staleDelete(next, dims.rgdIds, r.cfg.refRgdId,
          r.cfg.speciesTypeKey, staleCutoff, r.cfg.createdBy, thresholdPct,
          initial)
      // materialize this species' output, then release everything this
      // iteration no longer needs: the pre-delete merge immediately, the
      // previous species' snapshot next — only ONE table stays pinned
      afterDelete.cache().count()
      merged.unpersist()
      prevCached.foreach(_.unpersist())
      prevCached = Seq(afterDelete)
      table = afterDelete
      (r.name, ops, report)
    }

    // U5: rat-ISO stale delete vs the time-zero snapshot
    val (finalTable, isoReport) = MergeSink.staleDelete(table, dims.rgdIds,
      isoRefRgdId, RAT, staleCutoff,
      runs.headOption.map(_.cfg.createdBy).getOrElse(CREATED_BY),
      thresholdPct, isoInitial)

    RunReport(perSpecies, Some(isoReport), finalTable)
  }

  // ----------------------------------------------------- chinchilla path
  /** S5: chinchilla manual GO annotations from the existing table
    * (DAO.java:260-268): not pipeline-written, GO terms only, active
    * chinchilla genes.
    */
  def chinchillaAnnotations(fullAnnot: DataFrame, rgdIds: DataFrame): DataFrame = {
    val activeChin = broadcast(rgdIds
      .filter(col("object_status") === "ACTIVE" &&
        col("species_type_key") === CHINCHILLA &&
        col("object_key") === GENES_OBJECT_KEY)
      .select("rgd_id"))
    fullAnnot
      .filter(!col("created_by").isin(67, 192) &&
        col("term_acc").startsWith("GO:"))
      .join(activeChin, col("annotated_object_rgd_id") === col("rgd_id"),
        "left_semi")
  }

  /** S6: render annotations back into 17-column GAF rows so the DB-sourced
    * path flows through the same plan (MAHParser.java:85-122).
    */
  def toGafLines(annots: DataFrame): DataFrame =
    annots.select(
      lit("RGD").as("db"),
      col("annotated_object_rgd_id").cast("string").as("db_object_id"),
      col("object_symbol").as("db_object_symbol"),
      coalesce(col("qualifier"), lit("")).as("qualifier"),
      col("term_acc").as("go_id"),
      coalesce(col("xref_source"), lit("")).as("db_reference"),
      col("evidence"),
      coalesce(col("with_info"), lit("")).as("with_info"),
      col("aspect"),
      col("object_name").as("db_object_name"),
      lit("").as("db_object_synonym"),
      lit("gene").as("db_object_type"),
      lit("taxon:34839").as("taxon"),
      date_format(coalesce(col("original_created_date"), col("created_date")),
        "yyyyMMdd").as("gaf_date"),
      col("data_src").as("assigned_by"),
      coalesce(col("annotation_extension"), lit("")).as("annotation_extension"),
      coalesce(col("gene_product_form_id"), lit("")).as("gene_product_form_id"))

  /** The §3.3 chinchilla run: DB scan -> GAF re-projection -> the same
    * pipeline with refRgdId=0 (direct branch suppressed: only the rat ISO
    * derivation survives, F11).
    */
  def chinchillaRun(fullAnnot: DataFrame, dims: Dimensions, isoRefRgdId: Int,
                    runTs: Timestamp): SpeciesRun =
    SpeciesRun("chinchilla",
      toGafLines(chinchillaAnnotations(fullAnnot, dims.rgdIds)),
      PipelineConfig(
        speciesTypeKey = CHINCHILLA,
        refRgdId = 0,
        isoRefRgdId = isoRefRgdId,
        sources = Seq("RGD"),
        runTs = runTs))
}
