package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 decomposition of the `dedup_semantic_stored_replay` bench row
  * (the board's #2 at ~10-11 s): replay the query body with per-phase
  * timing — index build (memoized in the harness; timed here once),
  * store save, the three stored classifies (probe collect + pruned ADC
  * + localize), the two folds (encode + appendSave), fragmentCount —
  * so optimization targets the real sink instead of the aggregate.
  *
  * Usage: Test/runMain graft.SemStoredReplayDecompMain [sfDir] [reps]
  */
object SemStoredReplayDecompMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SEMREPLAY $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    def localized(df: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)

    val docs = Tables.documents(spark, sfDir)
    val b1base = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
        pmod($"doc_id", lit(2)) === 0)
      .select($"doc_id", $"text")
    val b1 = b1base.unionByName(
      b1base.filter(pmod($"doc_id", lit(8)) === 0)
        .select(($"doc_id" + 500000).as("doc_id"), $"text"))
    val b2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
        pmod($"doc_id", lit(2)) === 1)
      .select($"doc_id", $"text")
      .unionByName(b1base.filter(pmod($"doc_id", lit(4)) === 0)
        .select(($"doc_id" + 200000).as("doc_id"), $"text"))

    val idx = timed("index_build")(
      graft.queries.Fixtures.histSemanticIdx(spark, sfDir))
    (1 to reps).foreach { rep =>
      println(s"SEMREPLAY --- rep $rep")
      val tmp = java.nio.file.Files.createTempDirectory("graft_sem_decomp")
      val dir = tmp.resolve("idx").toUri.toString
      try {
        timed("save")(graft.dedup.SemanticIndexIO.save(idx, dir))
        val a1 = timed("classify1")(localized(
          graft.dedup.Dedup.semanticStatusStored(
            spark, dir, b1, "doc_id", "text", gen = Some(1L))))
        val kept1 = a1.filter($"status" === "kept")
          .select($"doc_id", $"text")
        def fold(n: String): Unit = timed(n) {
          graft.dedup.SemanticIndexIO.appendSave(spark, dir,
            graft.dedup.Dedup.semanticEncode(
              graft.dedup.SemanticIndexIO.load(spark, dir), kept1,
              "doc_id", "text"),
            batchGen = Some(1L))
        }
        fold("fold1")
        val a1r = timed("classify2_replay")(localized(
          graft.dedup.Dedup.semanticStatusStored(
            spark, dir, b1, "doc_id", "text", gen = Some(1L))))
        fold("fold2_noop")
        val a2 = timed("classify3")(localized(
          graft.dedup.Dedup.semanticStatusStored(
            spark, dir, b2, "doc_id", "text", gen = Some(2L))))
        timed("fragmentCount")(
          graft.dedup.SemanticIndexIO.fragmentCount(spark, dir))
        // fine breakdown of one stored classify (replicates
        // semanticStatusStored's body step by step)
        val idxL = timed("  cls:load")(
          graft.dedup.SemanticIndexIO.load(spark, dir))
        val qf = timed("  cls:q_build")(
          graft.text.TextAnalysis.hashedEmbeddings(b2, "doc_id", "text",
              idxL.model.dim)
            .select($"doc_id".as("q_id"), $"embedding".as("q_vec")).persist())
        val cellsv = timed("  cls:probe_collect")(
          graft.dedup.Dedup.semanticProbeCells(b2, idxL, "doc_id", "text")
            .collect().map(_.getLong(0)).toSeq)
        val prunedf = timed("  cls:prune_plan")(idxL.copy(
          codes = graft.dedup.SemanticIndexIO.prunedCodes(spark, dir,
            cellsv, genBound = Some(2L))))
        timed("  cls:classify_collect")(
          graft.dedup.Dedup.semanticStatus(b2, prunedf, "doc_id", "text")
            .collect())
        qf.unpersist()
        graft.dedup.Dedup.releaseStoredClassifyCache()
        println(s"SEMREPLAY rows a1=${a1.count()} a1r=${a1r.count()} " +
          s"a2=${a2.count()}")
      } finally Tables.deleteTree(tmp)
    }
    spark.stop()
  }
}
