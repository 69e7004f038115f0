package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Quantizer-drift evidence probe (VERDICT r13 missing #3): shows
  * [[Dedup.semanticDrift]]'s two metrics MOVING under a deliberately
  * drifted corpus while near-rewrite retrieval recall degrades, and a
  * rebuild restoring it — the measured basis for the rebuild trigger
  * documented on semanticDrift.
  *
  * Protocol (documents table, sf0.01 by default):
  *   - hist = doc_id%3!=0; index trained on hist.
  *   - UNDRIFTED leg: increment A = doc_id%3==0 re-idded; fold into the
  *     index; increment B = NEAR-REWRITES of A (a token appended), new
  *     ids; retrieval recall = fraction of B whose top-1 match is its A
  *     source. Near-rewrites, not exact re-crawls: exact re-crawls ride
  *     the own-cell containment guarantee and cannot degrade.
  *   - DRIFTED leg: same A/B with every vowel re-keyed
  *     (translate(text, aeiou->qxzvw)) — every token hashes elsewhere,
  *     so embeddings leave the training distribution while the
  *     A-to-B near-rewrite relation is preserved.
  *   - REBUILT leg: retrain the index on hist + drifted A, classify
  *     drifted B against it.
  *
  * Run: sbt "Test/runMain graft.SemDriftProbeMain [sfDir]"
  */
object SemDriftProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
    val incBase = docs.filter(pmod($"doc_id", lit(3)) === 0)

    def rekey(df: DataFrame): DataFrame =
      df.withColumn("text", translate($"text", "aeiouAEIOU", "qxzvwQXZVW"))
    // near-rewrite of each doc: same text plus an appended token, a new
    // id offset by 500000 so source = match_id + 500000 identifies hits
    def rewrites(df: DataFrame): DataFrame =
      df.select(($"doc_id" + 500000L).as("doc_id"),
        concat($"text", lit(" appended marker token")).as("text"))

    def recall(index: Dedup.SemanticIndex, b: DataFrame): Double = {
      val st = Dedup.semanticStatus(b, index, "doc_id", "text",
        threshold = 0.9)
      val n = b.count()
      val hits = st.filter($"match_id" === $"doc_id" - 500000L).count()
      hits.toDouble / n
    }

    def fmtD(s: Dedup.DriftStats): String =
      f"rows=${s.rows} meanAssignCos=${s.meanAssignCos}%.4f " +
        f"topShare=${s.topShare}%.3f (topCells=${s.topCells} " +
        f"cellsHit=${s.cellsHit}/${s.cells})"

    val idx = Dedup.semanticIndex(hist, "doc_id", "text")

    // ---- undrifted leg
    val aU = incBase
    val base = Dedup.semanticDrift(idx, aU, "doc_id", "text")
    println(s"DRIFTPROBE baseline(undrifted A): ${fmtD(base)}")
    val idxU = Dedup.semanticAppend(idx, aU, "doc_id", "text")
    val rU = recall(idxU, rewrites(aU))
    println(f"DRIFTPROBE recall undrifted: $rU%.3f")

    // ---- drifted leg (same quantizer — the deployment that kept
    // appending without rebuilding)
    val aD = rekey(incBase)
    val dStats = Dedup.semanticDrift(idx, aD, "doc_id", "text")
    println(s"DRIFTPROBE drifted A vs old quantizer: ${fmtD(dStats)}")
    val idxD = Dedup.semanticAppend(idx, aD, "doc_id", "text")
    val rD = recall(idxD, rewrites(aD))
    println(f"DRIFTPROBE recall drifted (stale quantizer): $rD%.3f")

    // ---- rebuilt leg (the documented recovery boundary)
    val idxR = Dedup.semanticIndex(hist.unionByName(aD), "doc_id", "text")
    val dR = Dedup.semanticDrift(idxR, aD, "doc_id", "text")
    println(s"DRIFTPROBE drifted A vs REBUILT quantizer: ${fmtD(dR)}")
    val rR = recall(idxR, rewrites(aD))
    println(f"DRIFTPROBE recall drifted (rebuilt): $rR%.3f")

    println(f"DRIFTPROBE summary: meanCos ${base.meanAssignCos}%.4f -> " +
      f"${dStats.meanAssignCos}%.4f, topShare ${base.topShare}%.3f -> " +
      f"${dStats.topShare}%.3f, recall $rU%.3f -> $rD%.3f -> " +
      f"rebuilt $rR%.3f")
    spark.stop()
  }
}
