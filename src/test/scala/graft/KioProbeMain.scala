package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev probe pinning the cross-generation scan-reuse landmine behind
  * DedupIndexIO.load's localize-before-combining contract: c2 evaluated
  * ALONE sees the appended keys (11 exact_hist re-crawls at sf0.01),
  * but the lazy union of c1 (pre-append scan) and c2 (post-append scan)
  * puts two scans of the same store root path into one plan, Spark
  * canonicalizes them equal (InMemoryFileIndex.equals compares only
  * rootPaths) and reuse serves c2 the PRE-append snapshot — the same
  * 11 re-crawls silently leak as kept in the union output.
  */
object KioProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
    val inc1 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
        pmod($"doc_id", lit(2)) === 0)
      .select($"doc_id", $"text")
    val inc2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
        pmod($"doc_id", lit(2)) === 1)
      .select($"doc_id", $"text")
      .unionByName(inc1.filter(pmod($"doc_id", lit(4)) === 0)
        .select(($"doc_id" + 200000).as("doc_id"), $"text"))
    val tmp = java.nio.file.Files.createTempDirectory("probe_kio")
    val dir = tmp.resolve("idx").toUri.toString
    graft.dedup.DedupIndexIO.save(
      Dedup.dedupIndex(hist, "doc_id", "text", k = 16, bands = 2), dir)
    val c1 = Dedup.incrementalStatus(inc1,
      graft.dedup.DedupIndexIO.load(spark, dir),
      "doc_id", "text", k = 16, bands = 2)
    val kept1 = c1.filter($"status" === "kept").select($"doc_id", $"text")
    graft.dedup.DedupIndexIO.append(spark, dir, kept1, "text")
    println("rows after append: " + spark.read.parquet(dir).count())
    val c2 = Dedup.incrementalStatus(inc2,
      graft.dedup.DedupIndexIO.load(spark, dir),
      "doc_id", "text", k = 16, bands = 2)
    println("c2: " + c2.groupBy($"status").count().collect().mkString(" "))
    println("recrawls: " + c2.filter($"doc_id" >= 200000)
      .groupBy($"status").count().collect().mkString(" "))
    // hypothesis: lazy union of c1 (pre-append scan) and c2 (post-append
    // scan) canonicalizes both store scans equal -> reuse -> stale c2
    val out = c1.select($"doc_id", lit(1).as("increment"), $"status")
      .unionByName(c2.select($"doc_id", lit(2).as("increment"), $"status"))
    println("union: " + out.groupBy($"increment", $"status").count()
      .collect().sortBy(_.toString).mkString(" "))
    Tables.deleteTree(tmp)
    spark.stop()
  }
}
