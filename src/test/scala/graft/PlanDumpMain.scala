package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Scratch main: dump `.explain("formatted")` for a query subset (or every
  * registered query) under Bench's exact session config, one file per
  * query, for the optimization-round plan audit (guide §1 / §7.2 — count
  * Exchanges, join strategies, PushedFilters/ReadSchema, codegen spans).
  *
  * Usage: <sfDir> <outDir> [q1,q2,... | all] [suffix=before]
  * Writes <outDir>/<name>_<suffix>.txt. Queries that throw at plan time
  * get an _ERROR file so the sweep never dies half-way.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val sel = args.drop(2).headOption.getOrElse("all")
    val suffix = args.drop(3).headOption.getOrElse("before")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (sel == "all") SparkEntry.queries.keys.toSeq.sorted
      else sel.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { name =>
      val path = Paths.get(outDir, s"${name}_$suffix.txt")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(path, txt.getBytes("UTF-8"))
        println(s"PLAN $name ok")
      } catch { case e: Throwable =>
        Files.write(path, s"ERROR: ${e}".getBytes("UTF-8"))
        println(s"PLAN $name ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
