package graft

import org.apache.spark.sql.functions._
import graft.gaf.{AnnotationPipeline, Fixtures}

/** Physical-plan regression guards: the properties that make these plans
  * scale (pushdown, pruning, broadcast joins, codegen fusion) asserted on
  * the executed plans so a refactor can't silently lose them.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan queries push filters and prune columns at the parquet scan") {
    val p = plan(SparkEntry.queries("s1_scan_filter_project")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p)
    // pruned read schema: only the 3 projected + filtered columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double"), p)
    assert(!p.contains("l_extendedprice"), "column pruning lost: " + p)
  }

  test("dimension joins broadcast instead of shuffling the fact side") {
    val p = plan(SparkEntry.queries("j1_lookup_join")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1 aggregates partially before the exchange (map-side combine)") {
    val p = plan(SparkEntry.queries("q1_pricing_summary")(spark, sf))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
    // formatted bottom-up: partial agg appears under the exchange
    assert(p.lastIndexOf("HashAggregate") > exchange, p)
  }

  test("the domain gene-match cascade broadcasts every dimension") {
    val dims = Fixtures.dims(spark)
    val matched = AnnotationPipeline.matchGenes(
      AnnotationPipeline.filterSources(Fixtures.mouseGaf(spark),
        Seq("MGI", "UniProtKB")), dims, graft.gaf.Constants.MOUSE)
    val p = plan(matched)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "gene-match cascade must not shuffle the GAF side: " + p)
  }

  test("text analysis fuses into a single codegen stage over the scan") {
    val p = plan(graft.text.TextAnalysis.analyze(
      Tables.documents(spark, sf), "text"))
    // one whole-stage-codegen span (marker *(1)), no exchanges
    assert(p.contains("*(1)"), p)
    assert(!p.contains("Exchange"), "text analysis must be map-only: " + p)
  }
}
