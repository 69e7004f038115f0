package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 probe: stored-semantic-index cost vs FRAGMENT COUNT. The
  * append-only store trades write cost (now increment-sized) for a
  * fragment union at read time; this measures what that union costs as
  * fragments accumulate — load + a fixed stored-classify at several
  * fragment depths, then compact() and the same classify after — the
  * evidence behind the streaming hook's fold-past-16 default and the
  * `fragmentCount` polling contract.
  *
  * Usage: SemFragScaleMain [sfDir] [appends, default 24]
  */
object SemFragScaleMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val appends = args.drop(1).headOption.map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.dedup.{Dedup, SemanticIndexIO}

    val docs = Tables.documents(spark, sfDir)
    val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      .select($"doc_id", $"text")
    // a fixed classify batch: fresh docs plus re-crawls of history
    val batch = docs.filter(pmod($"doc_id", lit(3)) === 0).limit(150)
      .select($"doc_id", $"text")
      .unionByName(hist.limit(50)
        .select(($"doc_id" + 800000000L).as("doc_id"), $"text"))
      .localCheckpoint()
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semfrag").toUri.toString
    try {
      SemanticIndexIO.save(Dedup.semanticIndex(hist, "doc_id", "text"), dir)
      val checkpoints = Set(1, 8, 16, appends)
      def classifyWall(): (Long, Double) =
        timed(Dedup.semanticStatusStored(spark, dir, batch,
          "doc_id", "text").filter($"status" === "sem_hist").count()) match {
          case (n, t) => (n, t)
        }
      (1 to appends).foreach { i =>
        val inc = docs.filter(pmod($"doc_id", lit(3)) === 0)
          .limit(200)
          .select(($"doc_id" + 900000000L + i * 1000000L).as("doc_id"),
            concat($"text", lit(" inc"), lit(i)).as("text"))
        val loaded = SemanticIndexIO.load(spark, dir)
        val (_, tApp) = timed(SemanticIndexIO.appendSave(spark, dir,
          Dedup.semanticEncode(loaded, inc, "doc_id", "text")))
        if (checkpoints(i)) {
          val frags = SemanticIndexIO.fragmentCount(spark, dir)
          val (_, tLoad) = timed(
            SemanticIndexIO.load(spark, dir).codes.count())
          val ((hits, tCls)) = classifyWall()
          println(f"SEMFRAG frags=$frags%-3d append=$tApp%5.2fs " +
            f"load_count=$tLoad%5.2fs classify=$tCls%5.2fs hits=$hits")
        }
      }
      val (_, tCompact) = timed(SemanticIndexIO.compact(spark, dir))
      val fragsAfter = SemanticIndexIO.fragmentCount(spark, dir)
      val (_, tLoad2) = timed(SemanticIndexIO.load(spark, dir).codes.count())
      val ((hits2, tCls2)) = classifyWall()
      println(f"SEMFRAG compacted frags=$fragsAfter compact=$tCompact%5.2fs " +
        f"load_count=$tLoad2%5.2fs classify=$tCls2%5.2fs hits=$hits2")
    } finally Tables.deleteTree(
      java.nio.file.Paths.get(new java.net.URI(dir)))
    spark.stop()
  }
}
