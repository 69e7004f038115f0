package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import graft.gaf.{AnnotationPipeline, Constants, Dimensions}
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
}
