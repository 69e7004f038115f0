package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure what q1_pricing_summary's decimal(20,6) aggregation actually
  * costs vs alternatives (round-5 verdict: 6.46 s at sf0.1 is the one
  * unexplained bench number). Times the SAME digest action Bench uses so
  * nothing is pruned. Variants:
  *
  *   dec20  — the shipped query: decimal(20,6) casts (precision > 18, so
  *            every value is a heap java.math.BigDecimal; Spark's Decimal
  *            compact-long fast path never engages)
  *   dec12  — decimal(12,2) inputs (TPC-H's own money type): values and
  *            partial sums stay compact-long; the end result cast to
  *            double is value-identical on this data (2-decimal money)
  *   double — raw double sums (nondeterministic across partition orders;
  *            kept only as the floor)
  *
  * Usage: Test/runMain graft.Q1ProbeMain [sfDir]
  */
object Q1ProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def dec(p: Int, s: Int): DataFrame = {
      val t = s"decimal($p,$s)"
      Tables.lineitem(spark, d)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast(t)).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast(t)).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice".cast(t) *
            (lit(BigDecimal(1)) - $"l_discount".cast(t))).cast(t))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "dec20" -> (() => dec(20, 6)),
      "dec12" -> (() => dec(12, 2)),
      "double" -> (() => Tables.lineitem(spark, d)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum($"l_extendedprice").as("sum_base_price"),
          sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))))

    def digest(df: DataFrame): Long =
      df.select(xxhash64(struct(df.columns.map(col).toSeq: _*)).as("_h"))
        .agg(expr("bit_xor(_h)")).head().getLong(0)

    // warm: footers + codegen for each variant
    variants.foreach { case (_, f) => digest(f()) }
    for ((name, f) <- variants; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val h = digest(f())
      println(f"Q1PROBE $name rep=$rep wall=${(System.nanoTime() - t0) / 1e9}%.2fs digest=$h%016x")
    }
    // value parity dec20 vs dec12 (the digest includes doubles, so equal
    // digests == bitwise-equal results)
    println("Q1PROBE parity dec20==dec12: " + (digest(dec(20, 6)) == digest(dec(12, 2))))
    spark.stop()
  }
}
