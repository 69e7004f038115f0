package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Semantic-increment scale probe: grow the HISTORY by replication
  * (replica-unique ids, replica-salted text so replicas aren't byte
  * dups), keep the increment fixed, and measure index build + steady-
  * state classify. Expected shape: classify cost per increment doc
  * grows ~√history (probe argmax against k≈√n centroids + nProbe
  * buckets of ≈√n codes each), never linearly — the claim behind the
  * IVFADC routing. Usage: SemIncScaleMain <sfDir> <factor...>.
  */
object SemIncScaleMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
    val histBase = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      .select($"doc_id", $"text")
    // fixed increment: fresh docs + re-crawls of replica-0 history
    // (re-crawl text matches replica 0's salted form, so they embed
    // identically to an indexed page at every factor)
    val batch = docs.filter(pmod($"doc_id", lit(3)) === 0)
      .select($"doc_id", $"text")
      .unionByName(histBase.filter(pmod($"doc_id", lit(10)) === 1)
        .select(($"doc_id" + 10000000L).as("doc_id"),
          concat($"text", lit(" rep0")).as("text")))
      .persist()
    val nBatch = batch.count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    factors.foreach { factor =>
      val hist = histBase
        .crossJoin(spark.range(factor).select($"id".as("_rep")))
        .select(($"doc_id" * factor + $"_rep" + 20000000L).as("doc_id"),
          // replica-salted text: replicas are near, not byte-identical
          concat($"text", lit(" rep"), $"_rep").as("text"))
        .persist()
      val nHist = hist.count()
      var idx: Dedup.SemanticIndex = null
      val tBuild = timed {
        idx = Dedup.semanticIndex(hist, "doc_id", "text")
        val codes = idx.codes.persist()
        codes.count()
        idx = idx.copy(codes = codes)
      }
      def classify(): Unit =
        Dedup.semanticStatus(batch, idx, "doc_id", "text")
          .select($"doc_id", $"status").foreach(_ => ())
      classify() // warm
      val tClassify = timed(classify())
      val caught = Dedup.semanticStatus(batch, idx, "doc_id", "text")
        .filter($"doc_id" >= 10000000L && $"status" === "sem_hist").count()
      println(f"SEMINC_SCALE sf=$sfDir factor=$factor hist=$nHist " +
        f"batch=$nBatch build=${tBuild}%.1fs classify=${tClassify}%.2fs " +
        f"per_doc_ms=${tClassify * 1000 / nBatch}%.2f recrawl_caught=$caught")
      idx.codes.unpersist()
      hist.unpersist()
    }
    spark.stop()
  }
}
