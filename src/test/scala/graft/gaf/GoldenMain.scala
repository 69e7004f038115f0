package graft.gaf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the canonical digest of the flagship e2e output (count + sum of
  * per-row xxhash64 over name-sorted stringified columns) — the committed
  * golden value asserted by E2eSpec.
  */
object GoldenMain {
  def digest(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
    val cols = df.columns.sorted.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000")))
    val h = df.select(xxhash64(concat_ws("\u0001", cols: _*)).as("h"))
    val r = h.agg(count(lit(1)), sum(col("h").cast("decimal(38,0)"))).head()
    (r.getLong(0), r.getDecimal(1))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // further args: registered query names to digest instead of the e2e
    if (args.length <= 1) {
      val (n, s) = digest(graft.queries.GafE2eQueries.annotateE2e(spark, d))
      println(s"GOLDEN rows=$n hashSum=$s")
    } else args.drop(1).foreach { q =>
      val (n, s) = digest(graft.SparkEntry.queries(q)(spark, d))
      println(s"GOLDEN $q rows=$n hashSum=$s")
    }
    spark.stop()
  }
}
