package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.gaf._

/** The flagship: the WHOLE per-species annotation plan (sources -> QC ->
  * gene-match cascade -> ISO derivation -> enrichment -> consolidation ->
  * overflow merge) running over a deterministic GAF + dimension set
  * derived from the harness tables, at harness scale (600k GAF lines at
  * sf0.1). No SQL oracle — replicating the 9-stage plan in one DuckDB
  * query is impractical; stage-level semantics are oracle-checked by the
  * s/f/p/j/a/u queries and spec-tested on micro-fixtures. The driver
  * records a rows-only check; Bench times it.
  */
object GafE2eQueries extends QueryPack {

  /** Dimensions are pure functions of (session, dir): memoize them so
    * repeated invocations (Bench warm+timed pass, Verify) reuse one
    * cached `part` scan instead of re-deriving and re-caching per call.
    */
  private val dimsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Dimensions]()

  def dims(s: SparkSession, d: String): Dimensions =
    dimsCache.computeIfAbsent((s, d), k => buildDims(k._1, k._2))

  /** Dimensions derived from part/nation: genes = parts (every 10th one
    * retired with a history redirect to the next id), terms = the go_id
    * domain, orthologs map each gene to gene+1000000 ("rat" side).
    */
  private def buildDims(s: SparkSession, d: String): Dimensions = {
    import s.implicits._
    val part = Tables.part(s, d).cache()
    val genes = part.select(
      $"p_partkey".cast("int").as("rgd_id"),
      $"p_name".as("gene_symbol"), $"p_name".as("full_name"),
      lit("protein-coding").as("gene_type_lc"),
      lit(Constants.HUMAN).as("species_type_key"))
    val ratGenes = part.select(
      ($"p_partkey" + 1000000).cast("int").as("rgd_id"),
      concat($"p_name", lit("_rat")).as("gene_symbol"),
      $"p_name".as("full_name"),
      lit("protein-coding").as("gene_type_lc"),
      lit(Constants.RAT).as("species_type_key"))
    val allGenes = genes.unionByName(ratGenes)

    val rgdIds = allGenes.select($"rgd_id",
      lit(Constants.GENES_OBJECT_KEY).as("object_key"),
      when($"rgd_id" < 1000000 && $"rgd_id" % 10 === 3, "RETIRED")
        .otherwise("ACTIVE").as("object_status"),
      $"species_type_key")

    val history = part.filter($"p_partkey" % 10 === 3)
      .select($"p_partkey".cast("int").as("old_rgd_id"),
        ($"p_partkey" + 1).cast("int").as("new_rgd_id"))

    val xdb = part.select($"p_partkey".cast("int").as("rgd_id"),
      lit(Constants.XDB_UNIPROT).as("xdb_key"),
      concat(lit("ACC"), $"p_partkey").as("acc_id"))

    val ontTerms = s.range(0, 500).select(
      concat(lit("GO:"), col("id")).as("term_acc"),
      concat(lit("term "), col("id")).as("term"),
      lit("GO").as("ont_id"), lit(0).as("is_obsolete"))

    val ontSynonyms = s.range(0, 10).select(
      concat(lit("GO:"), col("id") * 37).as("term_acc"),
      lit(Constants.NOT4CURATION).as("synonym_name"),
      lit("exact").as("synonym_type"))

    val ontDag = s.range(1, 200).select(
      concat(lit("GO:"), col("id") / 2).as("parent_term_acc"),
      concat(lit("GO:"), col("id")).as("child_term_acc"),
      lit("is_a").as("ont_rel_id"))

    val orthologs = part.select($"p_partkey".cast("int").as("src_rgd_id"),
      ($"p_partkey" + 1000000).cast("int").as("dest_rgd_id"))

    Dimensions(rgdIds, allGenes, xdb, history, ontTerms, ontSynonyms,
      ontDag, orthologs)
  }

  /** Deterministic GAF facts from lineitem: one annotation line per row. */
  def gaf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the whole annotate() chain is map-side until consolidation, so scan
    // parallelism bounds it end-to-end — spread() the single-file toy scan
    Tables.spread(Tables.lineitem(s, d)).select(
      lit("UniProtKB").as("db"),
      concat(lit("ACC"), $"l_partkey").as("db_object_id"),
      concat(lit("sym"), $"l_partkey").as("db_object_symbol"),
      when($"l_linenumber" % 4 === 0, "colocalizes_with").otherwise("")
        .as("qualifier"),
      concat(lit("GO:"), $"l_orderkey" % 497).as("go_id"),
      concat(lit("PMID:"), $"l_orderkey" % 1000).as("db_reference"),
      element_at(typedLit(Seq("IDA", "IEA", "IMP", "ISS")),
        ($"l_linenumber" % 4 + 1).cast("int")).as("evidence"),
      when($"l_linenumber" % 3 === 0,
        concat(lit("UniProtKB:W"), $"l_suppkey")).otherwise("").as("with_info"),
      element_at(typedLit(Seq("F", "P", "C")),
        ($"l_suppkey" % 3 + 1).cast("int")).as("aspect"),
      lit("a name").as("db_object_name"),
      lit("").as("db_object_synonym"),
      lit("protein").as("db_object_type"),
      lit("taxon:9606").as("taxon"),
      date_format($"l_shipdate", "yyyyMMdd").as("gaf_date"),
      lit("UniProtKB").as("assigned_by"),
      lit("").as("annotation_extension"),
      when($"l_linenumber" % 5 === 0, concat(lit("UniProtKB:ACC"),
        $"l_partkey", lit("-2"))).otherwise("").as("gene_product_form_id"))
  }

  def cfg: PipelineConfig = PipelineConfig(
    speciesTypeKey = Constants.HUMAN,
    refRgdId = 77000001,
    isoRefRgdId = Constants.REF_ISO,
    sources = Seq("UniProtKB", "MGI"),
    runTs = Timestamp.valueOf("2026-01-01 00:00:00"))

  def annotateE2e(s: SparkSession, d: String): DataFrame =
    AnnotationPipeline.annotate(gaf(s, d), dims(s, d), cfg)

  // NOTE: Audit.pipelineCounters (A7 full parity, ~20 counters) is an ops
  // dump that re-runs several stage plans for audit granularity; it is
  // value-asserted on the fixture in OpsSpec rather than registered here,
  // where its extra passes would dominate every Verify/Bench run.
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gaf_pipeline_e2e" -> ((s, d) => annotateE2e(s, d))
  )

  override def oracleSql: Map[String, String] = Map.empty
}
