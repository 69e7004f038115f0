package graft.gaf

import org.apache.spark.sql.SparkSession

/** Manual end-to-end drive of the domain pipeline over the micro-fixtures
  * (dev utility: `sbt "Test/runMain graft.gaf.DemoMain"`).
  */
object DemoMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dims = Fixtures.dims(spark)
    val cfg = Fixtures.mouseConfig(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    val merged = AnnotationPipeline.run(
      Fixtures.mouseGaf(spark), Fixtures.emptyFullAnnot(spark), dims, cfg)
    println("PIPELINE_RESULT")
    merged.select("_op", "term_acc", "annotated_object_rgd_id", "evidence",
      "with_info", "xref_source", "notes", "object_symbol")
      .orderBy("term_acc", "annotated_object_rgd_id", "evidence")
      .show(20, false)
    spark.stop()
  }
}
