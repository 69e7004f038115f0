package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: dump formatted plans for key queries and grep-check the
  * physical properties we require (pushdown, pruning, broadcast, codegen).
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_filter_project", "q1_pricing_summary", "j1_lookup_join",
        "a2_xref_merge", "f4_not4curation_antijoin", "text_token_counts")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, d)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
