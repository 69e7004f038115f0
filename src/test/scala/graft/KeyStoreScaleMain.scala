package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scale probe for the exact-keys store (DedupIndexIO): grow the
  * history by replication (distinct ids, per-replica token salt so the
  * key population actually grows) and at each size measure
  *
  *  - full index build+save (the rebuild-every-run shape the store
  *    exists to retire) — expected to grow with history,
  *  - append of a FIXED 500-doc increment (the deployment cycle) —
  *    expected ~flat: the increment's keys are computed and written
  *    without reading or re-shuffling a single history partition,
  *  - classify of that same fixed batch against the stored index —
  *    grows only with the compact key table's scan+join, never with
  *    history TEXT (which is never read).
  *
  * Results land in BASELINE.md next to SemStoreScaleMain's equivalent
  * evidence for the semantic store.
  */
object KeyStoreScaleMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.drop(1).headOption.getOrElse("1,4,16")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def wall[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = Tables.documents(spark, d).select($"doc_id", $"text")
    val nDocs = docs.count()
    val inc = docs.filter(pmod($"doc_id", lit(37)) === 0).limit(500)
      .select(($"doc_id" + 90000000L).as("doc_id"),
        concat(lit("incr token "), $"text").as("text"))
    for (f <- factors) {
      val hist = spark.range(f).crossJoin(docs)
        .select(($"doc_id" + $"id" * 10000000L).as("doc_id"),
          concat(lit("rep"), $"id", lit(" "), $"text").as("text"))
      val tmp = java.nio.file.Files.createTempDirectory("keystore_scale")
      val dir = tmp.resolve("idx").toUri.toString
      try {
        val (_, buildW) = wall {
          graft.dedup.DedupIndexIO.save(
            Dedup.dedupIndex(hist, "doc_id", "text", k = 16, bands = 2),
            dir)
        }
        val (_, appendW) = wall {
          graft.dedup.DedupIndexIO.append(spark, dir, inc, "text")
        }
        val (kept, classifyW) = wall {
          Dedup.incrementalStatus(inc,
              graft.dedup.DedupIndexIO.load(spark, dir),
              "doc_id", "text", k = 16, bands = 2)
            .filter($"status" === "kept").count()
        }
        println(f"KSS factor=$f%-3d hist=${f * nDocs}%8d " +
          f"build+save=$buildW%7.2f s  append500=$appendW%6.2f s  " +
          f"classify500=$classifyW%6.2f s  (kept=$kept)")
      } finally Tables.deleteTree(tmp)
    }
    spark.stop()
  }
}
