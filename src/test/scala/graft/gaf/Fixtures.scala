package graft.gaf

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.gaf.Constants._

/** Deterministic micro-fixtures per FIXTURES.md §A (domain family).
  *
  * Genes: 1001 mouse Acaca (MGI:87853), 1002 rat ortholog of 1001,
  * 1003 retired mouse (MGI:11111) redirecting to 1004 active mouse,
  * 1005 human (UniProt P12345 / secondary Q99999 / RNAcentral URS0001),
  * 1006 rat ortholog of 1005, 1007 chinchilla, 1008 rat ortholog of 1007.
  */
object Fixtures {

  def dims(spark: SparkSession): Dimensions = {
    def df(schema: org.apache.spark.sql.types.StructType, rows: Row*): DataFrame =
      spark.createDataFrame(java.util.List.of(rows: _*), schema)

    val rgdIds = df(Dims.rgdIds,
      Row(1001, 1, "ACTIVE", MOUSE), Row(1002, 1, "ACTIVE", RAT),
      Row(1003, 1, "RETIRED", MOUSE), Row(1004, 1, "ACTIVE", MOUSE),
      Row(1005, 1, "ACTIVE", HUMAN), Row(1006, 1, "ACTIVE", RAT),
      Row(1007, 1, "ACTIVE", CHINCHILLA), Row(1008, 1, "ACTIVE", RAT))

    val genes = df(Dims.genes,
      Row(1001, "Acaca", "acetyl-CoA carboxylase alpha", "protein-coding", MOUSE),
      Row(1002, "Acaca", "acetyl-CoA carboxylase alpha", "protein-coding", RAT),
      Row(1003, "Old1", "old gene", "protein-coding", MOUSE),
      Row(1004, "New1", "new gene", "protein-coding", MOUSE),
      Row(1005, "BRCA2", "breast cancer 2", "protein-coding", HUMAN),
      Row(1006, "Brca2", "breast cancer 2", "protein-coding", RAT),
      Row(1007, "Chin1", "chinchilla gene", "protein-coding", CHINCHILLA),
      Row(1008, "Rat8", "rat gene 8", "protein-coding", RAT))

    val xdb = df(Dims.rgdAccXdb,
      Row(1001, XDB_MGD, "MGI:87853"),
      Row(1003, XDB_MGD, "MGI:11111"),
      Row(1005, XDB_UNIPROT, "P12345"),
      Row(1005, XDB_UNIPROT_SECONDARY, "Q99999"),
      Row(1005, XDB_RNACENTRAL, "URS0001"))

    val history = df(Dims.rgdIdHistory, Row(1003, 1004))

    val ontTerms = df(Dims.ontTerms,
      Row("GO:0001", "term one", "GO", 0),
      Row("GO:0002", "term two", "GO", 0),
      Row("GO:0003824", "catalytic activity", "GO", 0),
      Row("GO:0004", "catalytic child", "GO", 0),
      Row("GO:0005", "catalytic grandchild", "GO", 0),
      Row("GO:9999", "do not curate", "GO", 0))

    val ontSynonyms = df(Dims.ontSynonyms,
      Row("GO:9999", NOT4CURATION, "exact"))

    val ontDag = df(Dims.ontDag,
      Row("GO:0003824", "GO:0004", "is_a"),
      Row("GO:0004", "GO:0005", "is_a"))

    val orthologs = df(Dims.orthologs,
      Row(1001, 1002), Row(1005, 1006), Row(1007, 1008))

    Dimensions(rgdIds, genes, xdb, history, ontTerms, ontSynonyms,
      ontDag, orthologs)
  }

  /** Mouse GAF file content (raw lines, with comments + MGI:MGI: ids). */
  val mouseGafLines: Seq[String] = {
    def l(db: String, id: String, sym: String, qual: String, go: String,
          ref: String, ev: String, withInfo: String, aspect: String = "F",
          ext: String = "", gpfi: String = ""): String =
      Seq(db, id, sym, qual, go, ref, ev, withInfo, aspect,
        "some name", "", "gene", "taxon:10090", "20240409", db, ext, gpfi)
        .mkString("\t")
    Seq(
      "!gaf-version: 2.2",
      // direct + ISO spawn (IDA is ISO-eligible); note the MGI:MGI: fix
      l("MGI", "MGI:MGI:87853", "Acaca", "", "GO:0001", "PMID:100", "IDA", ""),
      // duplicate differing only in xref -> A2 merge
      l("MGI", "MGI:87853", "Acaca", "", "GO:0001", "PMID:101", "IDA", ""),
      // retired gene -> J6 history redirect to 1004; IEA (not ISO-eligible)
      l("MGI", "MGI:11111", "Old1", "", "GO:0002", "PMID:200", "IEA", ""),
      // Not4Curation term -> F4 drop
      l("MGI", "MGI:87853", "Acaca", "", "GO:9999", "PMID:300", "IDA", ""),
      // IPI x descendant-of-catalytic -> F5 drop
      l("MGI", "MGI:87853", "Acaca", "", "GO:0005", "PMID:400", "IPI",
        "UniProtKB:P12345"),
      // non-configured source -> F2 drop
      l("FlyBase", "FB0001", "x", "", "GO:0001", "PMID:500", "IDA", ""),
      // unknown GO term -> F9 drop
      l("MGI", "MGI:87853", "Acaca", "", "GO:0404", "PMID:600", "IDA", ""),
      // qualifier rewrite P5 (IEA: no ISO)
      l("MGI", "MGI:87853", "Acaca", "colocalizes_with", "GO:0002",
        "PMID:700", "IEA", ""))
  }

  def mouseGaf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.sources.GafReader.fromLines(
      mouseGafLines.toDF("value"))
  }

  def mouseConfig(runTs: java.sql.Timestamp): PipelineConfig = PipelineConfig(
    speciesTypeKey = MOUSE,
    refRgdId = REF_MGI,
    isoRefRgdId = REF_ISO,
    sources = Seq("MGI", "UniProtKB"),
    runTs = runTs)

  def emptyFullAnnot(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.List.of[Row](), Dims.fullAnnot)
}
