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

    // CPU calibration: the host throttles sporadically (observed: the
    // same op swinging 4s <-> 248s with idle-CPU symptoms); a run is
    // only comparable when these spins match the quiet baseline
    // (~0.1-0.3s single, similar at 32x on a quiet 32-core host)
    def spin(): Double = {
      val t0 = System.nanoTime(); var x = 0L; var i = 0
      while (i < 300000000) { x += i; i += 1 }
      if (x == 42L) println("?") // keep the loop un-eliminable
      (System.nanoTime() - t0) / 1e9
    }
    val one = spin()
    val many = {
      val t0 = System.nanoTime()
      val ts = (1 to 32).map(_ => new Thread(() => spin()))
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"CORPUS_SCALE calib_1t=$one%.2fs calib_32t=$many%.2fs")

    // repartition before persist: the source parquet is one tiny file,
    // so the exploded cache would otherwise be ONE partition and every
    // op's pre-shuffle scan would run serially — a probe artifact, not
    // the layout a real corpus arrives in
    val par = spark.sparkContext.defaultParallelism
    val docs = Tables.documents(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", $"doc_id" * factor + $"_rep")
      .withColumn("text", concat(lit("u"), $"doc_id", lit(" "), $"text"))
      .drop("_rep")
      .repartition(par)
      .persist() // isolate op cost from the fan-out itself
    val nDocs = docs.count()

    val events = Tables.events(spark, d)
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("user_id", $"user_id" * factor + $"_rep")
      .withColumn("event_id", $"event_id" * factor + $"_rep")
      .drop("_rep")
      .repartition(par)
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
    // temporal joins: each event against the (fanned) per-user session
    // intervals — sessions-as-dimension is the realistic right side, and
    // it scales WITH the events, so both join inputs grow with factor.
    // Persisted so the join timings don't re-pay sessionize. The asof
    // timing forces the carried payload with head() on a value the
    // optimizer cannot constant-fold: a count() over the aggregate (or
    // over the bare window output) lets Catalyst prune the unused
    // window columns and collapse the plan to a row count — the first
    // draft of this probe "measured" exactly that, 0.6s for 10M rows
    // (AsofProfMain shows the honest number is ~10-15s at 100x).
    val sessions = graft.operators.Sessionize
      .byGap(events, "user_id", "ts", "event_id", 6L * 3600 * 1000000000L)
      .select(col("user_id"), col("session_id"), col("session_start"),
        (col("session_end") + 1L).as("session_end_x"))
      .persist()
    sessions.count()
    locally {
      val t0 = System.nanoTime()
      val matched = graft.operators.AsOfJoin.asOf(
        events.select(col("event_id"), col("user_id"), col("ts")),
        sessions.withColumnRenamed("session_start", "s_ts")
          .drop("session_end_x"),
        key = "user_id", leftTs = "ts", rightTs = "s_ts",
        payload = Seq("session_id"))
        .agg(count(col("session_id"))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CORPUS_SCALE op=asof_join factor=$factor in=$nEvents " +
        f"out=$matched wall=$sec%.1fs rate=${nEvents / sec}%.0f rows/s")
    }
    time("range_join", nEvents) {
      graft.operators.RangeJoin.pointInInterval(
        events.select(col("event_id"), col("user_id"), col("ts")),
        sessions, "ts", "session_start", "session_end_x",
        bucketWidth = 6L * 3600 * 1000000000L, keys = Seq("user_id"))
    }
    spark.stop()
  }
}
