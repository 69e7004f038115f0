package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: wall-time the full Audit.pipelineCounters dump (the A7
  * parity surface) at a given sf dir and print the counters. VERDICT r2
  * target: <30s at sf0.1.
  */
object CounterProfMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode",
        sys.env.getOrElse("GRAFT_SCHED", "FIFO"))
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("GRAFT_CACHE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e2e = graft.queries.GafE2eQueries
    val existing = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](), graft.gaf.Dims.fullAnnot)
    // dims are memoized by GafE2eQueries; pre-touch so the timed pass
    // measures the dump itself, as in a long-running ops context
    e2e.dims(spark, d)

    // two runs: the first is the cold shape, the second the warm one the
    // bench's timed pass actually measures (memoized fixpoint/closure,
    // warm scans) — optimize against run 2
    val reps = sys.env.getOrElse("GRAFT_COUNTERPROF_REPS", "2").toInt
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val counters = graft.operators.Audit.pipelineCounters(
        e2e.gaf(spark, d), e2e.dims(spark, d), e2e.cfg, existing).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      if (rep == reps)
        counters.foreach(r =>
          println(f"COUNTER ${r.getString(0)}%-55s ${r.getLong(1)}%d"))
      println(f"COUNTERPROF run$rep wall=$sec%.2f s")
    }
    spark.stop()
  }
}
