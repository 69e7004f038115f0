package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 probe: stored-semantic-index SAVE cost vs history size. At each
  * history factor, measure (a) the r12-equivalent FULL save of the
  * grown index (rewrites the whole history) and (b) the r13
  * `appendSave` of a FIXED-size increment (writes one fragment).
  * Done-criterion for the append-only redesign: (b) stays ~flat along
  * the ladder while (a) grows with the history.
  *
  * Usage: SemStoreScaleMain [sfDir] [factors csv, default 10,50,100]
  */
object SemStoreScaleMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.drop(1).headOption.getOrElse("10,50,100")
      .split(",").map(_.trim.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.dedup.{Dedup, SemanticIndexIO}

    val docs = Tables.documents(spark, sfDir)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    factors.foreach { factor =>
      val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
        .select($"doc_id", $"text")
        .crossJoin(spark.range(factor).select($"id".as("_rep")))
        .select(($"doc_id" * factor + $"_rep" + 20000000L).as("doc_id"),
          concat($"text", lit(" rep"), $"_rep").as("text"))
      // fixed-size increment, disjoint ids
      val inc = docs.filter(pmod($"doc_id", lit(3)) === 0).limit(500)
        .select(($"doc_id" + 900000000L).as("doc_id"), $"text")
      val idx = Dedup.semanticIndex(hist, "doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_semstore_f$factor").toString
      try {
        val (_, tInit) = timed(SemanticIndexIO.save(idx, dir))
        val loaded = SemanticIndexIO.load(spark, dir)
        val n = loaded.codes.count()
        val (_, tAppend) = timed(SemanticIndexIO.appendSave(spark, dir,
          Dedup.semanticEncode(loaded, inc, "doc_id", "text")))
        // the r12-equivalent: full save of the grown index back in place
        val grown = SemanticIndexIO.load(spark, dir)
        val (_, tFull) = timed(SemanticIndexIO.save(grown, dir))
        val (_, tCompact) = timed(SemanticIndexIO.compact(spark, dir))
        println(f"SEMSTORE f=$factor%-4d n=$n%-8d init_full=$tInit%6.1fs " +
          f"append_inc=$tAppend%6.2fs full_resave=$tFull%6.1fs " +
          f"compact=$tCompact%6.1fs")
      } finally Tables.deleteTree(java.nio.file.Paths.get(dir))
    }
    spark.stop()
  }
}
