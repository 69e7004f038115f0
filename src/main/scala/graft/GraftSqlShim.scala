package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute

/** Access bridge into `private[sql]` constructors, kept to the single
  * entry point graft.plans.Snapshot needs: wrap an already-materialized
  * RDD[InternalRow] in a LogicalRDD leaf frame (what
  * `Dataset.localCheckpoint` builds internally, but with the caller
  * owning the persisted RDD so its storage can be released
  * deterministically instead of waiting on the ContextCleaner).
  */
object GraftSqlShim {
  /** Wrap `rdd` as a leaf frame carrying `origin`'s statistics and
    * constraints (LogicalRDD.fromDataset — the same path
    * `Dataset.localCheckpoint` takes). Stats preservation is
    * load-bearing: a bare `LogicalRDD(output, rdd)` estimates
    * `spark.sql.defaultSizeInBytes` = Long.MaxValue, which (a) blocks
    * every downstream broadcast-join decision on the snapshot and
    * (b) saturated graft.Tuning.autoShuffle's leaf-sum byte estimate,
    * stickily pinning initialPartitionNum at its 65536 cap for the
    * whole session (measured: a later cache-disabled-AQE stage ran
    * 65536 real tasks, ~100s of empty-task overhead at sf0.01).
    */
  def rddFrame(origin: DataFrame, rdd: RDD[InternalRow]): DataFrame = {
    val ds = origin.asInstanceOf[classic.Dataset[_]]
    classic.Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD.fromDataset(rdd, ds, isStreaming = false))
  }

  /** Run `body` under a registered SQL execution id for `df`'s query
    * execution — the same wrapper Dataset actions use. Without it, a
    * hand-driven RDD action (Snapshot.materialize) never posts
    * SQLExecutionEnd, so `Observation`s riding CollectMetrics nodes in
    * the plan would wait forever for their metrics.
    */
  def withExecutionId[T](df: DataFrame, name: String)(body: => T): T = {
    val qe = df.queryExecution
      .asInstanceOf[execution.QueryExecution]
    execution.SQLExecution.withNewExecutionId(qe, Some(name))(body)
  }
}
