package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (gaps-and-islands): events for a key belong
  * to the same session while consecutive event times are within `gap`;
  * a larger silence starts a new session. The batch form of the
  * streaming sessionizer in [[graft.streaming.IncrementalStream]].
  *
  * Scale: ONE shuffle. The boundary lag and the running boundary count
  * share the same (key)-partitioned sort, and the closing per-session
  * aggregation clusters on (key, session_id) — HashPartitioning(key)
  * already satisfies that clustering, so Catalyst reuses the window
  * exchange instead of shuffling again (pinned in PlanSpec). Per-key
  * state is a sort within the partition; skewed keys are bounded by the
  * key's own event count, never the corpus.
  */
object Sessionize {

  /** Assign session ids and aggregate one row per (key, session):
    * (key, session_id, session_start, session_end, n_events), with
    * session_id numbering a key's sessions from 1 in time order.
    * `tsCol` is an epoch-count long in any unit (`gap` shares it);
    * `tieCol` breaks equal-timestamp ordering so the assignment is
    * deterministic under any partition layout.
    */
  def byGap(events: DataFrame, keyCol: String, tsCol: String,
            tieCol: String, gap: Long): DataFrame = {
    require(gap > 0, s"session gap must be positive, got $gap")
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(order)
    val newSession = when(
      prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L)
    events
      .withColumn("_nb", newSession)
      .withColumn("session_id", sum(col("_nb")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
