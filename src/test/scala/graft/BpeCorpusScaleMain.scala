package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for Bpe.trainCorpus: replicate the corpus (same vocab —
  * replication multiplies row count, not the distinct pre-token table)
  * and measure the whole train wall. The claim under test is
  * vocab-boundedness: the explode+groupBy count is map-side combined on
  * repeated words, the TakeOrdered cut and the driver merge loop are
  * constant in corpus size, so the wall should grow far slower than the
  * corpus — the property that makes "train THE corpus's tokenizer" a
  * one-shuffle operation at 100 TB rather than a driver OOM.
  */
object BpeCorpusScaleMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.drop(1).headOption.getOrElse("1,1,8,64")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.documents(spark, d).select($"text")
    val n = docs.count()
    var last: Seq[(String, String)] = null
    for (f <- factors) {
      val corpus = spark.range(f).crossJoin(docs).select($"text")
      val t0 = System.nanoTime()
      val merges = graft.text.Bpe.trainCorpus(corpus, "text",
        numMerges = 200)
      val w = (System.nanoTime() - t0) / 1e9
      println(f"BCS factor=$f%-3d rows=${f * n}%8d train=$w%7.2f s " +
        f"merges=${merges.length}%3d")
      // replication must not change the learned table (same relative
      // frequencies): parity across factors, printed loudly if violated
      if (last != null && merges != last)
        println(s"BCS WARNING: merge table changed under replication!")
      last = merges
    }
    spark.stop()
  }
}
