package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import graft.gaf.{AnnotationPipeline, Constants, Dimensions, PipelineConfig}
import graft.plans.DagClosure

/** Observability — the reference's CounterPool (~20 named counters,
  * GoNonratAnnotationPipeline.java:180-234) and its 12 audit log files
  * (log4j2.xml:9-91) re-expressed Spark-first:
  *
  *  - counters ride the existing plan via `Dataset.observe` (zero extra
  *    scans, aggregated map-side with the action that runs anyway);
  *  - audit "logs" are side-output DataFrames — the rejected complement
  *    of each QC branch — computed on demand from the same lineage
  *    instead of being written row-by-row under a lock.
  */
object Audit {

  /** Attach named conditional counters to a plan. Metrics surface on the
    * Observation after the next action on the returned DataFrame.
    */
  def observed(df: DataFrame, obs: Observation,
               counters: Map[String, Column]): DataFrame = {
    val aggs = counters.toSeq.sortBy(_._1).map { case (name, cond) =>
      count(when(cond, 1)).as(name)
    }
    df.observe(obs, count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** The pipeline's standard QC counters (A7 subset). */
  def qcCounters(gaf: DataFrame, obs: Observation): DataFrame =
    observed(gaf, obs, Map(
      "iso_eligible" -> col("evidence").isin(Constants.isoEvidenceCodes.toSeq: _*),
      "ipi" -> (col("evidence") === "IPI"),
      "mgi_sourced" -> (col("db") === "MGI")))

  // -------------------------------------------- audit side outputs
  /** highLevelGoTerm.log — rows dropped by F4. */
  def droppedNot4Curation(gaf: DataFrame, dims: Dimensions): DataFrame = {
    val banned = dims.ontSynonyms
      .filter(col("synonym_name") === Constants.NOT4CURATION)
      .select(col("term_acc").as("go_id")).distinct()
    gaf.join(broadcast(banned), Seq("go_id"), "left_semi")
  }

  /** catalyticActivityIPIGoTerm.log — rows dropped by F5. */
  def droppedCatalyticIpi(gaf: DataFrame, dims: Dimensions): DataFrame = {
    val catalytic = DagClosure
      .descendantsOf(dims.ontDag, "parent_term_acc", "child_term_acc",
        lit(Constants.CATALYTIC_ACTIVITY))
      .select(col("descendant").as("go_id"))
    gaf.filter(col("evidence") === "IPI")
      .join(broadcast(catalytic.union(
        gaf.sparkSession.sql(s"SELECT '${Constants.CATALYTIC_ACTIVITY}' AS go_id"))),
        Seq("go_id"), "left_semi")
  }

  /** unmatched.log — source lines that matched no active gene. */
  def unmatched(gaf: DataFrame, dims: Dimensions, fileSpecies: Int): DataFrame = {
    val filtered = AnnotationPipeline.qcTermFilters(gaf, dims)
    val matched = AnnotationPipeline.matchGenes(filtered, dims, fileSpecies)
      .select(col("db"), col("db_object_id")).distinct()
    filtered.join(matched, Seq("db", "db_object_id"), "left_anti")
  }

  /** noGoTerm.log — annotations whose term is missing from ONT_TERMS (F9). */
  def unknownTerms(gaf: DataFrame, dims: Dimensions): DataFrame =
    gaf.join(broadcast(dims.ontTerms.select(col("term_acc").as("go_id"))),
      Seq("go_id"), "left_anti")

  /** wrongEvidence counts (A6) — ISO-ineligible evidence codes seen. */
  def wrongEvidenceCounts(gaf: DataFrame): DataFrame =
    gaf.filter(!col("evidence").isin(Constants.isoEvidenceCodes.toSeq: _*))
      .groupBy(col("evidence")).agg(count(lit(1)).as("cnt"))

  // ------------------------------- audit resolve variants (J6 parity)
  /** Identity resolve: every gene id maps to itself regardless of status
    * or species — plugs into [[AnnotationPipeline.matchGenes]] to expose
    * RAW candidate matches for the inactive.log path.
    */
  def identityResolve(dims: Dimensions): DataFrame =
    dims.rgdIds.filter(col("object_key") === Constants.GENES_OBJECT_KEY)
      .select(col("rgd_id").as("raw_rgd_id"), col("rgd_id").as("final_rgd_id"))

  /** inactive.log — (line, gene) pairs whose RAW candidate gene is not
    * ACTIVE (MAHQC.java:169-190 increments per non-active gene in the
    * candidate list, before the species check). Multi-hop redirect
    * targets still count their retired sources, like the reference.
    */
  def inactive(gaf: DataFrame, dims: Dimensions, fileSpecies: Int): DataFrame = {
    val raw = AnnotationPipeline.matchGenes(gaf, dims, fileSpecies,
      Some(identityResolve(dims)))
    val notActive = dims.rgdIds
      .filter(col("object_key") === Constants.GENES_OBJECT_KEY &&
        col("object_status") =!= "ACTIVE")
      .select(col("rgd_id"))
    raw.join(broadcast(notActive), Seq("rgd_id"), "left_semi")
  }

  /** noRatGene.log — (line, matched gene) pairs that are ISO-eligible but
    * have no rat ortholog (MAHQC.java:195-200).
    */
  def noRatGene(matched: DataFrame, dims: Dimensions,
                cfg: PipelineConfig): DataFrame =
    matched.filter(col("evidence").isin(cfg.isoCodes.toSeq: _*))
      .join(broadcast(dims.orthologs.select(col("src_rgd_id").as("rgd_id"))
        .distinct()), Seq("rgd_id"), "left_anti")

  /** insert/updated/upToDate(touch)/keep row lists from the merged `_op`
    * column (log4j2.xml insert/updated/upToDate appenders).
    */
  def opRows(merged: DataFrame, op: String): DataFrame =
    merged.filter(col("_op") === op)

  /** delete.log — the stale rows a U4 pass would remove (same predicate
    * as [[MergeSink.staleDelete]], exposed as a row list).
    */
  def deleteCandidates(table: DataFrame, rgdIds: DataFrame, refRgdId: Int,
                       speciesTypeKey: Int, cutoff: java.sql.Timestamp,
                       createdBy: Int): DataFrame =
    MergeSink.staleCandidates(table, rgdIds, refRgdId, speciesTypeKey,
      cutoff, createdBy)

  /** fileDownload.log — one row per ingest attempt. */
  def fileDownloadLog(spark: org.apache.spark.sql.SparkSession,
                      results: Seq[(String, graft.sources.IngestArchive.IngestResult)])
      : DataFrame = {
    import spark.implicits._
    results.map { case (name, r) =>
      (name, r.path.toString, r.downloaded,
        r.dedupedAgainst.map(_.toString).orNull)
    }.toDF("name", "path", "downloaded", "deduped_against")
  }

  // --------------------------------------- A7 full counter parity
  /** The reference's end-of-run counter dump
    * (GoNonratAnnotationPipeline.dumpStats, lines 180-234, plus every
    * `counters.increment` site in MAHQC/MAHDL/WithInfoConsolidator),
    * re-derived from the pipeline's stage frames as one long-format
    * (counter, value) DataFrame — the `detail` log is this, sorted.
    *
    * This is an OPS DUMP, not part of the hot path: it re-runs stage
    * plans for audit granularity (the reference pays the same cost
    * inline via a synchronized CounterPool on every record). Counter
    * semantics and granularities follow the reference line-for-line;
    * divergences are called out inline.
    */
  def pipelineCounters(gaf: DataFrame, dims: Dimensions, cfg: PipelineConfig,
                       existing: DataFrame): DataFrame = {
    import AnnotationPipeline._
    val spark = gaf.sparkSession

    // ---- main pass: one end-to-end plan with observe() hooks at every
    // stage boundary — these ~14 counters cost ZERO extra scans (they
    // aggregate map-side with the single action at the bottom). persist()
    // of the wide intermediates was measured SLOWER than recomputation.
    val src = filterSources(gaf, cfg.sources)
    val qc = qcTermFilters(src, dims)
    val matched = matchGenes(qc, dims, cfg.speciesTypeKey)

    // MATCH BY <db>: db values are bounded by the cfg.sources allow-list
    val obsMatch = new Observation("match")
    val matchedObs = matched.observe(obsMatch,
      count(lit(1)).as("n"),
      cfg.sources.map(s =>
        count(when(col("db") === s, 1)).as(s"by_$s")): _*)

    // scalar-QC counters in reference evaluation order (F7 -> P6 -> F8 ->
    // P7/P5/P8, MAHQC.java:250-316): each condition only counts rows
    // surviving the earlier gates
    val selfRef = col("with_info") <=>
      concat(lit("RGD:"), col("annotated_object_rgd_id"))
    val isoEv = col("evidence") === "ISO"
    val hasGpfi = length(coalesce(col("gene_product_form_id"), lit(""))) > 0
    val emptyWi = length(coalesce(col("with_info"), lit(""))) === 0
    val s1 = !selfRef
    val skippedIso = s1 && isoEv && emptyWi && !hasGpfi
    val s2 = s1 && !(isoEv && emptyWi && !hasGpfi)
    val obsBuilt = new Observation("built")
    val built = buildAnnotations(matchedObs, dims, cfg).observe(obsBuilt,
      count(lit(1)).as("n"),
      count(when(selfRef, 1)).as("selfRef"),
      count(when(s1 && isoEv && hasGpfi, 1)).as("movedGpfi"),
      count(when(skippedIso, 1)).as("skippedIso"),
      count(when(s2 && isoEv &&
        length(coalesce(col("annotation_extension"), lit(""))) > 0, 1))
        .as("clearedExt"),
      count(when(s2 && coalesce(col("qualifier"), lit(""))
        .contains("colocalizes_with"), 1)).as("replacedQual"),
      count(when(s2 && col("data_src")
        .isin(cfg.dataSrcSubstMap.keys.toSeq: _*), 1)).as("dataSrcSubst"))

    val obsEnriched = new Observation("enriched")
    val enriched = qcAndEnrich(built, dims, cfg)
      .observe(obsEnriched, count(lit(1)).as("n"))
    val obsCons = new Observation("consolidated")
    val consolidated = graft.operators.Consolidator.consolidate(
        enriched.drop("_row_id", "_prio"),
        consolidationKey, "with_info", Constants.WITH_INFO_CAP)
      .observe(obsCons, count(lit(1)).as("n"))
    val mergedA2 = AnnotMerge.merge(consolidated, mergeKey,
      "xref_source", "notes", Constants.XREF_SOURCE_CAP)

    val incoming = mergedA2
      .withColumn("full_annot_key", lit(null).cast("long"))
      .withColumn("created_date", lit(null).cast("timestamp"))
      .withColumn("last_modified_date", lit(null).cast("timestamp"))
      .withColumn("created_by", lit(cfg.createdBy))
      .withColumn("last_modified_by", lit(cfg.createdBy))
      .select(existing.columns.map(col): _*)
    val merged = MergeSink.merge(existing, incoming, cfg.runTs,
      cfg.createdBy).persist() // small final table; reused for updOrig

    // ONE action drives the whole observed chain
    val ops = merged.groupBy(col("_op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = obsMatch.get
    val b = obsBuilt.get
    val enrichedN = obsEnriched.get("n").asInstanceOf[Long]
    val consolidatedN = obsCons.get("n").asInstanceOf[Long]
    val matchBy = cfg.sources
      .map(s => s"MATCH BY $s" -> m(s"by_$s").asInstanceOf[Long])
      .filter(_._2 > 0)

    // ---- side passes, only where a different plan is genuinely needed
    // F4, then F5 on F4 survivors (MAHQC.process returns between checks)
    val f4 = droppedNot4Curation(src, dims).count()
    val f5 = droppedCatalyticIpi(
      src.join(broadcast(dims.ontSynonyms
          .filter(col("synonym_name") === Constants.NOT4CURATION)
          .select(col("term_acc").as("go_id"))),
        Seq("go_id"), "left_anti"), dims).count()

    // unmatched: lines with no ACTIVE gene of ANY species after redirect
    // (MAHQC.java:81-84 — the species test comes later, so active-but-
    // foreign matches are NOT unmatched)
    val matchedAny = matchGenes(qc, dims, cfg.speciesTypeKey,
      Some(resolveGeneIds(dims, -1)))
    val unmatchedN = qc.join(
      matchedAny.select(col("db"), col("db_object_id")).distinct(),
      Seq("db", "db_object_id"), "left_anti").count()

    val inactiveN = inactive(qc, dims, cfg.speciesTypeKey).count()
    val noRatN = noRatGene(matched, dims, cfg).count()

    // F9 needs the term anti-join (not a scalar predicate)
    val unknownTermN = buildAnnotations(matched, dims, cfg).filter(s2)
      .join(broadcast(dims.ontTerms.select(col("term_acc"))),
        Seq("term_acc"), "left_anti").count()

    // A4 deltas: "with_info merges" counts merged-away annotations;
    // "incoming lines removed" counts LINES whose every annotation was
    // consolidated into a group kept by another line
    // (WithInfoConsolidator.java:78-95) — keeper = min line id per group,
    // mirroring the reference keeping the bucket's first record.
    val mergesN = enrichedN - consolidatedN
    val enrichedAgain = qcAndEnrich(built, dims, cfg)
    val mergeable = enrichedAgain
      .filter(length(coalesce(col("with_info"), lit(""))) > 0)
    val keepers = mergeable.groupBy(consolidationKey.map(col): _*)
      .agg(min(col("_row_id")).as("_row_id"))
      .select(col("_row_id")).distinct()
    val keptLines = enrichedAgain
      .filter(length(coalesce(col("with_info"), lit(""))) === 0)
      .select(col("_row_id")).distinct()
      .union(keepers).distinct()
    val linesRemovedN = enrichedAgain.select(col("_row_id")).distinct()
      .join(keptLines, Seq("_row_id"), "left_anti").count()

    // A2 overflow: every emission past the first per merge-key group
    val truncatedN =
      mergedA2.count() - mergedA2.dropDuplicates(mergeKey).count()

    val updOrigN = merged.filter(col("_op") === "update")
      .join(existing.select(col("full_annot_key"),
        col("original_created_date").as("_old_ocd")), Seq("full_annot_key"))
      .filter(!(col("original_created_date") <=> col("_old_ocd"))).count()

    val rows: Seq[(String, Long)] = Seq(
      "highLevelGoTerm" -> f4,
      "IPIAnnotToCatalyticActivityTerm" -> f5,
      "unmatchedCounter" -> unmatchedN,
      "inactiveCounter" -> inactiveN,
      "noRatGeneCounter" -> noRatN,
      "skippedSelfRefAnnots" -> b("selfRef").asInstanceOf[Long],
      "movedGeneProductFormIdIntoWithInfo" -> b("movedGpfi").asInstanceOf[Long],
      "skippedIsoAnnots" -> b("skippedIso").asInstanceOf[Long],
      "clearedAnnotationExtensionForIso" -> b("clearedExt").asInstanceOf[Long],
      "replacedQualifier_colocalizes_with" -> b("replacedQual").asInstanceOf[Long],
      "DATA_SRC substitutions" -> b("dataSrcSubst").asInstanceOf[Long],
      "notFoundInRgdGoTermCount" -> unknownTermN,
      "with_info merges" -> mergesN,
      "incoming lines removed" -> linesRemovedN,
      "  TRUNCATED XREF_SOURCE (XREF_SOURCE LENGTH > 4000)" -> truncatedN,
      "matchingAnnotCount" -> ops.getOrElse("touch", 0L),
      "insertedAnnotCount" -> ops.getOrElse("insert", 0L),
      "updatedAnnotCount" -> ops.getOrElse("update", 0L),
      "updatedOrigCreatedDate" -> updOrigN
    ) ++ matchBy

    merged.unpersist()
    import spark.implicits._
    rows.toDF("counter", "value")
  }
}
