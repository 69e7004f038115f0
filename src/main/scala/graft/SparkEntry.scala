package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryPack module. Each query name corresponds to an
  * operator id in SURVEY.md §2 phrased over the harness tables, with a
  * DuckDB-equivalent oracle in [[oracleSql]].
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    CoreQueries, PipelineQueries, JoinQueries, AggQueries,
    TextQueries, CorpusQueries, CurationQueries, DedupQueries,
    SimilarityQueries,
    MultimodalQueries, GafE2eQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full per-species annotation plan over harness-derived GAF + dims.
    */
  def entry(spark: SparkSession): DataFrame =
    GafE2eQueries.annotateE2e(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
