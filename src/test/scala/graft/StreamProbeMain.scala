package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: phase-time the ev_dedup_incremental harness row to
  * split stream fixed cost (start/stop, state commits) from data work.
  */
object StreamProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SP $n ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val parts = Seq("8", "1", "32", "8", "1")
    for (rep <- 1 to 5) {
      println(s"--- rep $rep parts=${parts(rep - 1)}")
      val docs = Tables.documents(spark, d)
      val batch = docs.filter(pmod($"doc_id", lit(3)) === 0)
        .select($"doc_id", $"text")
      val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      val idx = time("idx")(
        graft.dedup.BloomIndex.build(hist, "text", 5000, 0.001, 16, 2))
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val rows = time("collect")(batch.orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), t0)).toSeq)
      time("batchClassify")(
        graft.dedup.BloomIndex.classify(batch, idx, "text")
          .filter(col("status") === "kept")
          .withColumn("_fp",
            graft.text.TextAnalysis.fingerprint(col("text")))
          .dropDuplicates("_fp").count())
      val localRows = rows.map(r => (r._1, r._2, r._3))
      time("localClassify")({
        val df = spark.createDataFrame(localRows.toList.asInstanceOf[List[(Long, String, java.sql.Timestamp)]])
          .toDF("doc_id", "text", "ts")
        graft.dedup.BloomIndex.classify(df, idx, "text")
          .filter(col("status") === "kept").count()
      })
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, java.sql.Timestamp)]
      spark.conf.set("spark.sql.shuffle.partitions", parts(rep - 1))
      val q = time("start")(
        graft.streaming.IncrementalStream.incrementalDedupStream(
            input.toDF().toDF("doc_id", "text", "ts"), idx,
            "doc_id", "text", "ts", "1 hour", bounded = false)
          .select($"doc_id")
          .writeStream.format("memory").queryName(s"probe$rep")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .start())
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      time("batch1")({ input.addData(rows); q.processAllAvailable() })
      time("batch2")({
        input.addData(Seq((9999999L, rows.head._2,
          java.sql.Timestamp.valueOf("2026-01-01 00:00:01"))))
        q.processAllAvailable()
      })
      time("stop")(q.stop())
    }
    spark.stop()
  }
}
