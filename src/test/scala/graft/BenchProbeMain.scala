package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Scratch main: Bench's exact warm+timed loop, but printing per-query
  * wall, GC-time delta, and process-CPU delta — to localize the
  * round-4 full-bench slowdown (333s vs the 34s committed snapshot).
  */
object BenchProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("WARN")

    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuMs: Long = osBean.getProcessCpuTime / 1000000L

    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    val sorted = SparkEntry.queries.toSeq
      .filterNot(_._1 == "a7_counter_dump").sortBy(_._1)
    def pass(label: String): Unit = sorted.foreach { case (name, fn) =>
      val (t0, g0, c0) = (System.nanoTime(), gcMs, cpuMs)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"BP $label $name ERROR ${e.getClass.getSimpleName}") }
      val w = (System.nanoTime() - t0) / 1e9
      if (w > 1.0) println(f"BP $label $name wall=$w%.1fs gc=${(gcMs - g0) / 1000.0}%.1fs cpu=${(cpuMs - c0) / 1000.0}%.1fs heapMB=${Runtime.getRuntime.totalMemory() / 1048576}")
    }
    pass("warm")
    pass("timed")
    spark.stop()
  }
}
