package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, decomposed into an equi-join Spark can
  * shuffle-partition (guide preference (a): composition over a custom
  * physical operator).
  *
  * A pure range predicate (`start <= point AND point < end`) gives
  * Catalyst no equi-key, so the builtin plan is a broadcast
  * nested-loop / cartesian — O(|L|·|R|) comparisons, unusable at
  * corpus scale. Bucketing restores an equi-key: each interval is
  * exploded to the fixed-width time buckets it covers, each point maps
  * to exactly ONE bucket, and the join runs on (keys..., bucket) with
  * the exact range predicate as a post-filter. Each matching pair
  * meets in exactly one bucket (the point's), so no dedup pass is
  * needed. Cost: |R| · (span/bucketWidth) index rows + one hash
  * shuffle — linear, and the bucket width is the knob that trades
  * index fan-out against per-bucket candidate count (set it near the
  * median interval span).
  *
  * Interval sanity: rows with `end <= start` (empty or inverted) match
  * no point by definition and are dropped from the index. Intervals
  * spanning more than `maxBucketsPerInterval` buckets fail loudly
  * (`raise_error`) instead of silently exploding the index — widen the
  * bucket or split the interval.
  */
object RangeJoin {

  /** Inner point-in-interval join: left rows paired with every right
    * row whose half-open interval `[start, end)` contains the left
    * point, matching on `keys` first (optional equi-keys present on
    * both sides). Point/start/end columns must be integral (cast
    * timestamps to epoch micros first); column names must not clash
    * across sides (project/rename beforehand, as with any join).
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      leftPoint: String, rightStart: String, rightEnd: String,
                      bucketWidth: Long, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // the internal bucket column would silently shadow (withColumn
    // replaces) a caller column of the same name and misjoin
    require(!left.columns.contains("_bucket") &&
      !right.columns.contains("_bucket"),
      "inputs must not carry a _bucket column (internal name)")
    val w = lit(bucketWidth)
    val bFirst = floorDiv(col(rightStart), w)
    // half-open: the bucket of the last contained point, end - 1
    val bLast = floorDiv(col(rightEnd) - 1, w)
    val nBuckets = bLast - bFirst + 1
    val idx = right
      .filter(col(rightEnd) > col(rightStart))
      .withColumn("_bucket", explode(sequence(bFirst,
        when(nBuckets <= maxBucketsPerInterval, bLast).otherwise(raise_error(
          concat(lit(s"range interval spans more than $maxBucketsPerInterval" +
            s" buckets of width $bucketWidth at $rightStart="),
            col(rightStart).cast("string")))))))
    left.withColumn("_bucket", floorDiv(col(leftPoint), w))
      .join(idx, keys :+ "_bucket")
      .filter(col(rightStart) <= col(leftPoint) &&
        col(leftPoint) < col(rightEnd))
      .drop("_bucket")
  }

  /** Floored long division as a Column: `x - pmod(x, w)` is exactly
    * `floor(x/w)*w` (pmod is non-negative), so the integral divide is
    * exact for the full long range — no double rounding, and bucket
    * boundaries stay aligned for negative points too.
    */
  private def floorDiv(x: Column, w: Column): Column =
    call_function("div", x - pmod(x, w), w)
}
