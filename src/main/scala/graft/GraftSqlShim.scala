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
  def rddFrame(spark: SparkSession, output: Seq[Attribute],
               rdd: RDD[InternalRow]): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(cs, execution.LogicalRDD(output, rdd)(cs))
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
