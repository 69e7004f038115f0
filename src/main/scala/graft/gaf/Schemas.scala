package graft.gaf

import org.apache.spark.sql.types._

/** Schemas + constants of the annotation domain.
  *
  * GAF 2.x: 17 tab-separated columns, `!` comments
  * (reference: MAHParser.java:44-52; FIXTURES.md A1).
  * Dimension tables: FIXTURES.md A2, recovered from the jar SQL quoted in
  * SURVEY.md §2.3.
  */
object GafSchema {
  /** GAF column names by position (0-based). */
  val columns: Seq[String] = Seq(
    "db",                    // c0  source database (UniProtKB / MGI / RNAcentral / RGD)
    "db_object_id",          // c1  gene/protein accession
    "db_object_symbol",      // c2
    "qualifier",             // c3
    "go_id",                 // c4  GO term accession
    "db_reference",          // c5  PMID/GO_REF list -> XREF_SOURCE
    "evidence",              // c6  evidence code
    "with_info",             // c7  with/from, [|,]-delimited
    "aspect",                // c8  F/P/C
    "db_object_name",        // c9
    "db_object_synonym",     // c10
    "db_object_type",        // c11
    "taxon",                 // c12 taxon:NNNN
    "gaf_date",              // c13 yyyyMMdd
    "assigned_by",           // c14 -> DATA_SRC (after subst map)
    "annotation_extension",  // c15
    "gene_product_form_id"   // c16
  )

  val schema: StructType =
    StructType(columns.map(StructField(_, StringType, nullable = true)))
}

object Dims {
  val rgdIds = StructType(Seq(
    StructField("rgd_id", IntegerType),
    StructField("object_key", IntegerType),
    StructField("object_status", StringType),
    StructField("species_type_key", IntegerType)))

  val genes = StructType(Seq(
    StructField("rgd_id", IntegerType),
    StructField("gene_symbol", StringType),
    StructField("full_name", StringType),
    StructField("gene_type_lc", StringType),
    StructField("species_type_key", IntegerType)))

  val rgdAccXdb = StructType(Seq(
    StructField("rgd_id", IntegerType),
    StructField("xdb_key", IntegerType),
    StructField("acc_id", StringType)))

  val rgdIdHistory = StructType(Seq(
    StructField("old_rgd_id", IntegerType),
    StructField("new_rgd_id", IntegerType)))

  val ontTerms = StructType(Seq(
    StructField("term_acc", StringType),
    StructField("term", StringType),
    StructField("ont_id", StringType),
    StructField("is_obsolete", IntegerType)))

  val ontSynonyms = StructType(Seq(
    StructField("term_acc", StringType),
    StructField("synonym_name", StringType),
    StructField("synonym_type", StringType)))

  val ontDag = StructType(Seq(
    StructField("parent_term_acc", StringType),
    StructField("child_term_acc", StringType),
    StructField("ont_rel_id", StringType)))

  val orthologs = StructType(Seq(
    StructField("src_rgd_id", IntegerType),
    StructField("dest_rgd_id", IntegerType)))

  /** FULL_ANNOT (sink + existing-state) schema — SURVEY.md §1.3. */
  val fullAnnot = StructType(Seq(
    StructField("full_annot_key", LongType),
    StructField("term", StringType),
    StructField("annotated_object_rgd_id", IntegerType),
    StructField("rgd_object_key", IntegerType),
    StructField("data_src", StringType),
    StructField("object_symbol", StringType),
    StructField("ref_rgd_id", IntegerType),
    StructField("evidence", StringType),
    StructField("with_info", StringType),
    StructField("aspect", StringType),
    StructField("object_name", StringType),
    StructField("notes", StringType),
    StructField("qualifier", StringType),
    StructField("created_date", TimestampType),
    StructField("last_modified_date", TimestampType),
    StructField("term_acc", StringType),
    StructField("created_by", IntegerType),
    StructField("last_modified_by", IntegerType),
    StructField("xref_source", StringType),
    StructField("annotation_extension", StringType),
    StructField("gene_product_form_id", StringType),
    StructField("original_created_date", TimestampType)))
}

/** Domain constants (FIXTURES.md; jar constant pools quoted in SURVEY.md §1.2). */
object Constants {
  // species type keys
  val HUMAN = 1; val MOUSE = 2; val RAT = 3; val CHINCHILLA = 4
  val DOG = 6; val PIG = 9

  // xdb keys
  val XDB_UNIPROT = 14; val XDB_UNIPROT_SECONDARY = 60; val XDB_HGNC = 21
  val XDB_ENSEMBL = 20; val XDB_MGD = 5; val XDB_RNACENTRAL = 68

  // taxon -> species type key (subset used by fixtures/tests)
  val taxonToSpecies: Map[Int, Int] = Map(
    9606 -> HUMAN, 10090 -> MOUSE, 10116 -> RAT, 34839 -> CHINCHILLA,
    9615 -> DOG, 9823 -> PIG)

  /** Evidence codes that spawn rat ISO annotations (AppConfigure.xml:51-60). */
  val isoEvidenceCodes: Set[String] = Set("EXP", "IDA", "IEP", "IGI", "IMP", "IPI")

  /** DATA_SRC substitutions (AppConfigure.xml:46-50). */
  val dataSrcSubst: Map[String, String] = Map("UniProtKB" -> "UniProt")

  val CATALYTIC_ACTIVITY = "GO:0003824"
  val NOT4CURATION = "Not4Curation"

  val WITH_INFO_CAP = 1700   // WithInfoConsolidator.java:11
  val XREF_SOURCE_CAP = 4000 // MAHDL.java:89

  val CREATED_BY = 190       // AppConfigure.xml:32-35
  val REF_MGI = 2290270; val REF_ISO = 1624291; val REF_ALL_SPECIES = 150520179

  val GENES_OBJECT_KEY = 1
  /** Net-drop delete abort threshold (AppConfigure.xml:36). */
  val DELETE_THRESHOLD_PCT = 10.0
}
