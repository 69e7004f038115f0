package graft.gaf

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.GafE2eQueries

/** The flagship plan at harness scale (sf0.001): output stability and
  * the incremental-MERGE idempotence contract (rerun => all touch, U3).
  */
class E2eSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("e2e pipeline output is stable at sf0.001") {
    val out = GafE2eQueries.annotateE2e(spark, sf).cache()
    try {
      // 8292: the synthetic derivation draws aspect independently of go_id
      // (unlike real GO data), so exactly one A4 group at this sf holds two
      // aspects and stays split by the aspect-guarded consolidation key
      assert(out.count() === 8292)
      // ISO derivation present with provenance
      val iso = out.filter(col("evidence") === "ISO")
      assert(iso.count() > 0)
      assert(iso.filter(!col("with_info").startsWith("RGD:")).count() === 0)
      // every annotated object resolved to an active gene id space
      assert(out.filter(col("annotated_object_rgd_id").isNull).count() === 0)
    } finally out.unpersist()
    // unpersist matters beyond hygiene: suites share one session, and a
    // lingering cache of the WHOLE flagship plan makes CacheManager
    // substitute an InMemoryRelation for it in PlanSpec's plan-shape
    // assertions — which would then assert against the cache, not the plan
  }

  test("e2e golden digest at sf0.01 (the flagship's committed oracle)") {
    // Canonical digest of the full 9-stage output: count + sum of per-row
    // xxhash64 over name-sorted stringified columns (order-independent,
    // null-marked, fixed UTC run timestamp). Regenerate with
    // `Test/runMain graft.gaf.GoldenMain /root/testdata/sf0.01` ONLY for
    // an intentional, explained semantics change — this is the one check
    // that pins the end-to-end surface no single-stage oracle covers.
    val (rows, hashSum) =
      GoldenMain.digest(GafE2eQueries.annotateE2e(spark, "/root/testdata/sf0.01"))
    assert(rows === 83400L)
    assert(hashSum === new java.math.BigDecimal("1972030993281064291876"))
  }

  test("e2e merge is idempotent: rerun classifies everything as touch") {
    val dims = GafE2eQueries.dims(spark, sf)
    val cfg = GafE2eQueries.cfg
    val gaf = GafE2eQueries.gaf(spark, sf)
    val first = AnnotationPipeline.run(gaf,
      Fixtures.emptyFullAnnot(spark), dims, cfg)
    val ops1 = first.groupBy("_op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops1.keySet === Set("insert"))

    val snapshot = first.drop("_op").cache()
    snapshot.count()
    val second = AnnotationPipeline.run(gaf, snapshot, dims,
      cfg.copy(runTs = Timestamp.valueOf("2026-01-02 00:00:00")))
    val ops2 = second.groupBy("_op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops2.keySet === Set("touch"), s"expected all-touch, got $ops2")
    assert(ops2("touch") === ops1("insert"))
    snapshot.unpersist() // shared session: see the stability test's note
  }
}
