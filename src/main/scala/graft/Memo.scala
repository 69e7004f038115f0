package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Maintenance for the bounded identity-keyed dimension memos
  * (DagClosure.descendantsCache, AnnotationPipeline.fixpointCache /
  * xdbGuardCache).
  *
  * FRESHNESS CONTRACT (applies to every memo maintained here): entries
  * are keyed by DataFrame OBJECT identity, not by data content. Callers
  * must build a new frame when the data underneath changes (e.g. parquet
  * re-written at the same path) — re-using the same frame object serves
  * the stale memoized result, by design: dims are genome-release-scoped
  * and loaded once per (session, dir) by the callers that feed these
  * memos.
  */
object Memo {
  /** Evict entries whose owning SparkSession has stopped (they would pin
    * plans and block managers of dead sessions for the JVM lifetime),
    * then clear wholesale past `cap` entries (spec churn builds fresh
    * frames; the memos exist for repeated calls within one run).
    */
  def maintain[K, V](cache: ConcurrentHashMap[K, V], cap: Int = 64)(
      session: K => SparkSession): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      if (session(it.next()).sparkContext.isStopped) it.remove()
    }
    if (cache.size > cap) cache.clear()
  }
}
