package graft.gaf

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.gaf.Constants._

/** J6 multi-hop resolution unit tests (the jar's getActiveRgdIdFromHistory
  * is a recursive CONNECT BY — SURVEY.md §2.4 J6). Covers the chain shapes
  * the pipeline fixture can't: retired→retired→active, dead-end, cycle,
  * and the species guard folded into the resolve dim.
  */
class ResolveGeneIdsSpec extends SparkSpec {

  private def df(schema: org.apache.spark.sql.types.StructType, rows: Row*): DataFrame =
    spark.createDataFrame(java.util.List.of(rows: _*), schema)

  private def dims(history: Seq[(Int, Int)], rgdIds: Seq[(Int, String, Int)]): Dimensions = {
    val empty = Fixtures.emptyFullAnnot(spark) // placeholder; unused frames
    Dimensions(
      rgdIds = df(Dims.rgdIds, rgdIds.map { case (id, st, sp) => Row(id, 1, st, sp) }: _*),
      genes = empty, xdb = empty,
      history = df(Dims.rgdIdHistory, history.map { case (o, n) => Row(o, n) }: _*),
      ontTerms = empty, ontSynonyms = empty, ontDag = empty, orthologs = empty)
  }

  private def resolveMap(d: Dimensions): Map[Int, Int] =
    AnnotationPipeline.resolveGeneIds(d, MOUSE).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap

  test("retired -> retired -> active chain resolves through both hops") {
    val d = dims(
      history = Seq(1 -> 2, 2 -> 3),
      rgdIds = Seq((1, "RETIRED", MOUSE), (2, "RETIRED", MOUSE), (3, "ACTIVE", MOUSE)))
    val m = resolveMap(d)
    assert(m === Map(1 -> 3, 2 -> 3, 3 -> 3))
  }

  test("retired with no redirect and dead-end chains are absent") {
    val d = dims(
      history = Seq(10 -> 11), // 11 is retired with no further hop
      rgdIds = Seq((10, "RETIRED", MOUSE), (11, "RETIRED", MOUSE),
        (12, "RETIRED", MOUSE), (13, "ACTIVE", MOUSE)))
    val m = resolveMap(d)
    assert(m === Map(13 -> 13)) // 10/11 dead-end, 12 unredirected
  }

  test("chain landing on a wrong-species gene is dropped by the guard") {
    val d = dims(
      history = Seq(20 -> 21),
      rgdIds = Seq((20, "RETIRED", MOUSE), (21, "ACTIVE", RAT),
        (22, "ACTIVE", MOUSE)))
    val m = resolveMap(d)
    assert(m === Map(22 -> 22))
  }

  test("a redirect cycle fails loudly instead of looping forever") {
    val d = dims(
      history = Seq(30 -> 31, 31 -> 30),
      rgdIds = Seq((30, "RETIRED", MOUSE), (31, "RETIRED", MOUSE)))
    assertThrows[IllegalStateException] {
      AnnotationPipeline.resolveGeneIds(d, MOUSE, maxHops = 5).collect()
    }
  }

  test("history source absent from rgd_ids still resolves (raw-only id)") {
    // an old id that exists only in history (no status row) redirects fine
    val d = dims(
      history = Seq(40 -> 41),
      rgdIds = Seq((41, "ACTIVE", MOUSE)))
    val m = resolveMap(d)
    assert(m === Map(40 -> 41, 41 -> 41))
  }

  test("non-numeric redirect target falls back to the probing loop") {
    // exotic id scheme: the SOURCE id is a numeric string but the
    // redirect TARGET is not. try_cast silently nulls the target, so a
    // source-column-only guard would keep the driver fast path, drop the
    // redirect from the driver map, underestimate the chain depth, and
    // truncate the chain WITHOUT the convergence error. The pre-cast
    // non-null flag must force the probing loop, which handles any type.
    import org.apache.spark.sql.types._
    val strIds = StructType(Seq(
      StructField("rgd_id", StringType),
      StructField("object_key", IntegerType),
      StructField("object_status", StringType),
      StructField("species_type_key", IntegerType)))
    val strHist = StructType(Seq(
      StructField("old_rgd_id", StringType),
      StructField("new_rgd_id", StringType)))
    val empty = Fixtures.emptyFullAnnot(spark)
    val d = Dimensions(
      rgdIds = df(strIds,
        Row("1", 1, "RETIRED", MOUSE), Row("ABC", 1, "ACTIVE", MOUSE)),
      genes = empty, xdb = empty,
      history = df(strHist, Row("1", "ABC")),
      ontTerms = empty, ontSynonyms = empty, ontDag = empty,
      orthologs = empty)
    val m = AnnotationPipeline.resolveGeneIds(d, MOUSE).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map("1" -> "ABC", "ABC" -> "ABC"))
  }
}
