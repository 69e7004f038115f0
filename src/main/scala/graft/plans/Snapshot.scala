package graft.plans

import org.apache.spark.sql.DataFrame

import org.apache.spark.storage.StorageLevel

/** Eager materialization with LINEAGE TRUNCATION and deterministic
  * release — `Dataset.localCheckpoint` with ownership of the storage.
  *
  * Why not `cache()`: a cached frame keeps its FULL logical plan; every
  * downstream action re-pays Catalyst analysis + canonicalization over
  * that tree even though execution reads the cache. In iterated
  * orchestration (PipelineRunner.runAll) plans nest per iteration, and
  * the fixed plan overhead came to dominate wall time (measured: the
  * multi-species runner row was ~71s warm at BOTH sf0.01 and sf0.1 —
  * pure plan cost, zero data dependence; truncation cut it >2x).
  *
  * Why not `localCheckpoint()`: it persists an RDD the caller never
  * sees, so the storage is only released when the ContextCleaner GCs
  * the frame — an invocation-heavy harness (Verify + Bench warm/timed
  * passes) accumulates table-sized blocks until memory pressure forces
  * collection. Here the persisted RDD is returned with the frame, so
  * callers release scoped intermediates deterministically.
  *
  * Mirrors Dataset.checkpoint's internals (toRdd.map(_.copy()) — the
  * copy is load-bearing: physical operators reuse mutable UnsafeRows
  * per partition, so persisting without copying would alias rows).
  */
object Snapshot {

  /** A materialized frame plus the handle that frees its storage. The
    * RDD's own lineage is kept (only the LOGICAL plan is truncated), so
    * an access after `release()` recomputes instead of crashing — the
    * contract is still release-after-last-use, same as a cache.
    *
    * @param rows the materialized row count (the fill pass counts for
    *             free — callers needing N must not pay a second action)
    */
  final case class Snapped(df: DataFrame, rows: Long, release: () => Unit)

  /** Materialize `df` into executor storage (one pass over the input),
    * returning a frame whose logical plan is a single leaf.
    *
    * The fill runs under a registered SQL execution id, so
    * `Observation`s attached BELOW the materialization point fire
    * normally and deliver their metrics from this one pass.
    */
  def materialize(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : Snapped = {
    val qe = df.queryExecution
    val (rdd, n) = org.apache.spark.sql.GraftSqlShim
      .withExecutionId(df, "graft.Snapshot.materialize") {
        val r = qe.toRdd.map(_.copy())
        r.persist(level)
        // a failed fill must not strand the partitions it DID cache:
        // the Snapped handle (and its release closure) never comes to
        // exist, so nothing else can free them deterministically
        val c = try r.count() catch { case e: Throwable =>
          r.unpersist(blocking = false); throw e
        }
        (r, c)
      }
    val out = org.apache.spark.sql.GraftSqlShim.rddFrame(df, rdd)
    Snapped(out, n, () => { rdd.unpersist(blocking = false); () })
  }
}
