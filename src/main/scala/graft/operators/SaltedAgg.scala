package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware two-phase aggregation (SURVEY §2.5): a hot group key at
  * 100 TB (one gene id / one dup-cluster carrying millions of rows)
  * overwhelms its reducer; salting splits each group across `salts`
  * partial reducers, then a cheap second aggregation over `salts` rows
  * per key merges the partials.
  *
  * Use for algebraic aggregates (count/sum/min/max/collect-set-like);
  * AQE's skew handling covers joins, but aggregation skew needs this.
  */
object SaltedAgg {

  /** Salted count per key. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], salts: Int = 16)
      : DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }

  /** General salted aggregation: `partial` runs per (key, salt), `merge`
    * combines the `salts` partials per key. Column names must line up:
    * merge reads the columns partial produced.
    */
  def salted(df: DataFrame, keyCols: Seq[String], salts: Int)
            (partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
