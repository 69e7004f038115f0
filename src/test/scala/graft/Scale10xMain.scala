package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: 10x scale smoke for the flagship plan (VERDICT #7).
  *
  * Fans the sf0.1-derived GAF (600k lines) out to 6M lines by exploding
  * a 10-element sequence per line and perturbing `db_reference` so the
  * replicas stay distinct through consolidation (same trick a 10x
  * harness SF would produce: more lines per gene/term, dims unchanged —
  * dimension tables grow with the genome, not the annotation volume).
  * Asserts the full annotate() plan completes with no OOM and no
  * driver-side collect of fact-scale data, and prints lines/s for the
  * BASELINE.md addendum.
  */
object Scale10xMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    // partition sizing is THE scale knob: at high fan-out factors the
    // merge aggregations' per-partition state must fit the executor
    // heap. Since round 5 annotate() installs an input-adaptive AQE
    // initial partition count itself (graft.Tuning), so the probe runs
    // at DEFAULT config; SPARK_GRAFT_SHUFFLE remains as an A/B override
    // (it pins the non-AQE baseline partition count).
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // when the A/B override is set, pin the AQE initial partition count
    // to it as well — otherwise annotate()'s autoShuffle would install
    // its own and the env var would no longer reproduce the manual
    // baseline it exists to compare against
    sys.env.get("SPARK_GRAFT_SHUFFLE").foreach(n => builder.config(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    // A/B knob for the ObjectHashAggregate sort-based fallback threshold
    // (default 128 groups/partition; Bench pins 262144 in its session —
    // the r14 ladder re-baseline measures which one the probe JVM wants)
    sys.env.get("SPARK_GRAFT_OHA").foreach(v => builder.config(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.queries.GafE2eQueries._
    val gaf10 = gaf(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("db_reference",
        concat(col("db_reference"), lit("-"), col("_rep")))
      .drop("_rep")

    val inLines = gaf10.count()
    // warm pass at 1x so dims caches/codegen don't bill the timed pass
    graft.gaf.AnnotationPipeline.annotate(gaf(spark, d), dims(spark, d), cfg)
      .count()

    val t0 = System.nanoTime()
    val outRows =
      graft.gaf.AnnotationPipeline.annotate(gaf10, dims(spark, d), cfg).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"SCALE10X in_lines=$inLines out_rows=$outRows " +
      f"wall=$sec%.1fs rate=${inLines / sec}%.0f lines/s")
    spark.stop()
  }
}
