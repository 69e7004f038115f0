package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** First slice of the SURVEY §2 inventory phrased over the harness tables.
  *
  * Determinism rules used throughout (so DuckDB hash-compare is exact):
  *  - double aggregation goes through DECIMAL (exact, order-independent),
  *    then back to DOUBLE for a stable output schema;
  *  - string merges are sorted sets (array_sort ∘ array_distinct), the
  *    Spark-side analog of the reference's TreeSet semantics
  *    (MAHDL.java:84-118).
  */
object CoreQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 + F1: GAF gzip scan ≙ scan + filter + narrow projection.
    // Filter and projection must both push into the parquet scan.
    "s1_scan_filter_project" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_quantity" > 30.0 && $"l_returnflag" === "R")
        .select($"l_orderkey", $"l_partkey", $"l_quantity")
    }),

    // F2: source-database isin filter (MAHParser.java:55-67).
    "f2_source_filter" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
        .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
    }),

    // A1: per-source line count (MAHParser.java:38,55-62).
    "a1_source_counts" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("cnt"))
    }),

    // J1: xdb-accession equi-join, one-to-many fan-out (MAHQC.java:150).
    // part is the small dimension: broadcast, no shuffle of lineitem.
    "j1_lookup_join" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey", $"l_quantity")
      val p = Tables.part(s, d).select($"p_partkey", $"p_brand")
      li.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey", $"l_partkey", $"l_quantity", $"p_brand")
    }),

    // A2 (core, no overflow): duplicate-annotation merge — union, sort,
    // dedup of pipe-delimited tokens per group key (MAHDL.java:84-118).
    "a2_xref_merge" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(
          array_join(array_sort(collect_set($"o_orderpriority")), "|")
            .as("merged_src"),
          count(lit(1)).as("n_rows"))
    }),

    // Flagship: TPC-H Q1-style pricing summary (scan → filter →
    // hash-aggregate with partial map-side combine). Decimal-exact sums.
    "q1_pricing_summary" -> ((s, d) => q1(s, d))
  )

  def q1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("decimal(20,6)")).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(20,6)")).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice".cast("decimal(20,6)") *
          (lit(BigDecimal(1)) - $"l_discount".cast("decimal(20,6)")))
          .cast("decimal(20,6)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  override def oracleSql: Map[String, String] = Map(
    "s1_scan_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_quantity > 30.0 AND l_returnflag = 'R'""".stripMargin,

    "f2_source_filter" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin,

    "a1_source_counts" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1",

    "j1_lookup_join" ->
      """SELECT l_orderkey, l_partkey, l_quantity, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,

    "a2_xref_merge" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS merged_src,
        |  count(*) AS n_rows
        |FROM orders GROUP BY 1""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(20,6)) *
        |      (1 - CAST(l_discount AS DECIMAL(20,6))) AS DECIMAL(20,6))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin
  )
}
