package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-semantic-dedup batch-count probe (r12 verdict item 2): run
  * ≥5 micro-batches of mostly-KEPT docs through semanticDedupEachBatch
  * and time each batch. The r11 form re-embedded and re-encoded every
  * prior batch's kept docs per new batch — per-batch cost grew with the
  * number of prior batches (O(B²) over the stream). The checkpointed
  * form derives the grown index by READING the durable per-batch code
  * tables (map-only, no re-embed), so per-batch cost should stay ~flat
  * in batch count (the index itself grows, but probe work is bucket-
  * sized, not batch-count-sized).
  *
  * Usage: SemStreamScaleMain [sfDir] [nBatches] [compactEvery=0]
  * r13: pass compactEvery>0 to exercise the statuslog/indexstore fold —
  * per-batch wall should stay flat AND the live inc-dir count bounded
  * by compactEvery over an arbitrarily long stream.
  */
object SemStreamScaleMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 6
    val compactEvery = if (args.length > 2) args(2).toInt else 0
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, sfDir)
    // history = ids ≡ 0 (mod nBatches+1); batch i = ids ≡ i — disjoint
    // slices of distinct texts, so nearly every doc is KEPT and every
    // batch grows the durable code table (the worst case for the old
    // O(B²) re-encode, the honest case for the checkpoint read)
    val mod = nBatches + 1
    val hist = docs.filter(pmod($"doc_id", lit(mod)) === 0)
      .select($"doc_id", $"text")
    val idx0 = {
      val idx = graft.dedup.Dedup.semanticIndex(hist, "doc_id", "text")
      val codes = idx.codes.persist()
      codes.count()
      idx.copy(codes = codes)
    }
    val batches = (1 to nBatches).map { i =>
      docs.filter(pmod($"doc_id", lit(mod)) === i)
        .select($"doc_id", $"text").orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_semstream_scale").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = graft.streaming.IncrementalStream.semanticDedupEachBatch(
        input.toDF().toDF("doc_id", "text"), idx0, "doc_id", "text", outDir,
        compactEvery = compactEvery)
      .start()
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      batches.zipWithIndex.foreach { case (rows, i) =>
        val t0 = System.nanoTime()
        input.addData(rows)
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val statusP = java.nio.file.Paths.get(outDir, "status")
        val dirs = if (java.nio.file.Files.exists(statusP))
          java.nio.file.Files.list(statusP).count() else 0L
        println(f"SEMSTREAM sf=$sfDir batch=${i + 1} rows=${rows.size} " +
          f"secs=$dt%.2f inc_dirs=$dirs")
      }
    } finally q.stop()
    val statuses = graft.streaming.IncrementalStream
      .semanticDedupOutput(spark, outDir)
      .groupBy($"status").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(",")
    println(s"SEMSTREAM totals $statuses")
    Tables.deleteTree(java.nio.file.Paths.get(outDir))
    spark.stop()
  }
}
