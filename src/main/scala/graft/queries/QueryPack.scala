package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module of harness queries: name -> (spark, sfDir) -> DataFrame,
  * plus the DuckDB-equivalent SQL for the driver's correctness compare.
  *
  * Contract (see builder prompt): column names of the Spark result and
  * the oracle SQL result must match exactly — the compare sorts columns
  * by name before hashing. Aggregated doubles are cast to DECIMAL before
  * summing in BOTH engines so results are bit-deterministic regardless of
  * partitioning / evaluation order.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
