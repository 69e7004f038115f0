package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OBO ontology reader — the upstream file format of the GO term/DAG
  * dimensions the reference keeps in Oracle (`ONT_TERMS`, `ONT_SYNONYMS`,
  * `ONT_DAG`; SURVEY.md §1.1). Parsing it natively makes the engine
  * self-contained: OBO in -> terms/synonyms/edges DataFrames out ->
  * [[graft.plans.DagClosure]] for the hierarchy.
  *
  * Scale shape: `lineSep="[Term]"` turns each stanza into ONE text row,
  * so a multi-GB OBO file parses as an ordinary distributed scan — no
  * driver-side file slurp, no multi-line record assembly; all field
  * extraction is codegen'd regexp over the stanza string.
  */
object OboReader {

  /** One row per `[Term]` stanza with the raw stanza text. Trailing
    * non-Term sections ([Typedef] etc. at file end) would otherwise ride
    * along inside the final split row — truncate each row at the first
    * subsequent section header so typedef is_a/synonym/is_obsolete lines
    * never contaminate the last term.
    */
  def stanzas(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "[Term]").text(path)
      .select(regexp_replace(col("value"), "(?s)\\n\\[.*", "").as("stanza"))
      .filter(col("stanza").contains("\nid:") || col("stanza").startsWith("id:"))

  /** term_acc, term, ont_id, is_obsolete — ONT_TERMS shape (FIXTURES.md A2). */
  def terms(spark: SparkSession, path: String): DataFrame =
    stanzas(spark, path).select(
      regexp_extract(col("stanza"), "(?m)^id: *(\\S+)", 1).as("term_acc"),
      regexp_extract(col("stanza"), "(?m)^name: *(.+)$", 1).as("term"),
      substring_index(
        regexp_extract(col("stanza"), "(?m)^id: *(\\S+)", 1), ":", 1)
        .as("ont_id"),
      when(col("stanza").contains("\nis_obsolete: true"), 1).otherwise(0)
        .as("is_obsolete"))
      .filter(length(col("term_acc")) > 0)

  /** term_acc, synonym_name, synonym_type — ONT_SYNONYMS shape. One row
    * per `synonym:` line (explode over the per-stanza matches).
    */
  def synonyms(spark: SparkSession, path: String): DataFrame =
    stanzas(spark, path).select(
      regexp_extract(col("stanza"), "(?m)^id: *(\\S+)", 1).as("term_acc"),
      explode(expr(
        """regexp_extract_all(stanza, 'synonym: *"([^"]*)" *([A-Z]*)', 0)"""))
        .as("syn_line"))
      .select(col("term_acc"),
        regexp_extract(col("syn_line"), "\"([^\"]*)\"", 1).as("synonym_name"),
        lower(regexp_extract(col("syn_line"), "\" *([A-Z]+)$", 1))
          .as("synonym_type"))
      .filter(length(col("term_acc")) > 0)

  /** parent_term_acc, child_term_acc, ont_rel_id — ONT_DAG shape from
    * `is_a:` and `relationship: part_of` lines.
    */
  def edges(spark: SparkSession, path: String): DataFrame = {
    val st = stanzas(spark, path).select(
      regexp_extract(col("stanza"), "(?m)^id: *(\\S+)", 1).as("child_term_acc"),
      col("stanza"))
    val isA = st.select(col("child_term_acc"),
        explode(expr("regexp_extract_all(stanza, 'is_a: *(\\\\S+)', 1)"))
          .as("parent_term_acc"), lit("is_a").as("ont_rel_id"))
    val partOf = st.select(col("child_term_acc"),
        explode(expr(
          "regexp_extract_all(stanza, 'relationship: part_of *(\\\\S+)', 1)"))
          .as("parent_term_acc"), lit("part_of").as("ont_rel_id"))
    isA.unionByName(partOf)
      .filter(length(col("child_term_acc")) > 0)
      .select("parent_term_acc", "child_term_acc", "ont_rel_id")
  }
}
