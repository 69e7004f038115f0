package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch main: fan-out scale probe for the LLM-pipeline family — the
  * corpus-side analog of Scale10xMain's flagship probe. Fans documents
  * and events `factor`x (replica docs keep their text except a
  * replica-tagged lead token; ids/users are re-keyed so the key domain
  * grows with the data, as a bigger crawl's would) and times each
  * representative operator end to end.
  *
  * Replicas of one document are near-duplicates of each other BY
  * CONSTRUCTION — that is the realistic shape of a bigger crawl (dup
  * clusters grow with scale) and exactly what the bucketed dedup ops
  * must bound: LSH emits star edges (members-1 per bucket, linear in
  * factor). Pairwise enumerators (jaccardPairs/simhashPairs cross-band)
  * are deliberately NOT in this probe: the synthetic corpus contains a
  * ~2,400-doc near-identical template family (one LSH bucket holds
  * 48,819 of the 100k fanned docs, measured via MinhashProfMain), so
  * the TRUE >=0.8-Jaccard pair count is ~C(48k,2) = 1.15B rows — the
  * output itself is quadratic, no algorithm fixes that. At corpus scale
  * you run the linear star-edge/cluster forms, which is what
  * dedupCorpus does end to end.
  *
  * Usage: Test/runMain graft.CorpusScaleMain [sfDir] [factor]
  */
object CorpusScaleMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", $"doc_id" * factor + $"_rep")
      .withColumn("text", concat(lit("u"), $"doc_id", lit(" "), $"text"))
      .drop("_rep")
      .persist() // isolate op cost from the fan-out itself
    val nDocs = docs.count()

    val events = Tables.events(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("user_id", $"user_id" * factor + $"_rep")
      .withColumn("event_id", $"event_id" * factor + $"_rep")
      .drop("_rep")
      .persist()
    val nEvents = events.count()

    def time(name: String, in: Long)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CORPUS_SCALE op=$name factor=$factor in=$in out=$out " +
        f"wall=$sec%.1fs rate=${in / sec}%.0f rows/s")
    }

    time("exact_dedup", nDocs) {
      graft.dedup.Dedup.exactDedup(docs, "doc_id", "text")
    }
    time("minhash_lsh", nDocs) {
      graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text")
    }
    time("dedup_corpus_e2e", nDocs) {
      graft.dedup.Dedup.dedupCorpus(docs, "doc_id", "text")
    }
    time("chunk", nDocs) {
      graft.text.Chunker.chunkByTokens(docs, "doc_id", "text", 64, 48)
    }
    time("bm25_topk", nDocs) {
      graft.text.Ranking.bm25TopK(docs, "doc_id", "text",
        Seq("dup", "spark", "merge"), 50)
    }
    time("repetition", nDocs) {
      graft.text.CorpusQc.repetitionStats(docs, "doc_id", "text")
    }
    time("sessionize", nEvents) {
      graft.operators.Sessionize.byGap(events, "user_id", "ts", "event_id",
        6L * 3600 * 1000000000L)
    }
    spark.stop()
  }
}
