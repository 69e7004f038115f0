package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{NgramLm, QualityClassifier, TextAnalysis}

/** Dev scratch: per-stage survivor counts for the full-config curate,
  * to pin non-vacuous thresholds with measurement (not guesses).
  */
object CurateFullProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
    val corpus = docs.filter(pmod($"doc_id", lit(50)) =!= 0)
    val bench = docs.filter(pmod($"doc_id", lit(50)) === 0)
    val cfg = graft.operators.Curate.CurateConfig(
      contaminationN = 3, maxContaminationFrac = 0.06)
    val qc = corpus.filter(graft.operators.Curate.qcPredicate($"text", cfg))
    println(s"corpus=${corpus.count()} qc=${qc.count()}")
    val model = QualityClassifier.train(
      bench.withColumn("label",
        (TextAnalysis.qualityScore($"text") >= 0.8).cast("int")),
      "doc_id", "text", "label")
    val scored = qc.select($"doc_id",
      QualityClassifier.scoreColumn($"text", model).as("p"))
    scored.agg(min($"p"), expr("percentile(p, 0.1)"), avg($"p"),
      expr("percentile(p, 0.9)"), max($"p")).show(false)
    val ppl = NgramLm.perplexity(bench, qc, "doc_id", "text")
    ppl.agg(min($"avg_nll"), expr("percentile(avg_nll, 0.1)"),
      avg($"avg_nll"), expr("percentile(avg_nll, 0.5)"),
      expr("percentile(avg_nll, 0.9)"), max($"avg_nll")).show(false)
    val rem = graft.dedup.Dedup.removeRepeatedSpans(
      qc.select($"doc_id", $"text"), "doc_id", "text", 8)
    rem.agg(sum(when($"n_removed" > 0, 1).otherwise(0)),
      sum($"n_removed")).show(false)

    // stage-cost decomposition of the full config (each timed twice)
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); val n = mk.count()
        println(f"$tag%-28s run$i rows=$n t=${(System.nanoTime - t0) / 1e9}%.2fs")
      }
    val base = graft.operators.Curate.CurateConfig(
      contaminationN = 3, maxContaminationFrac = 0.06)
    val fullCfg = base.copy(maxPerplexityBits = 5.2, minQualityProb = 0.3,
      spanDedupN = Some(8))
    time("classic")(graft.operators.Curate.curate(
      corpus, bench, "doc_id", "text", base))
    time("classifier-only")(graft.operators.Curate.curate(
      corpus, bench, "doc_id", "text", base.copy(minQualityProb = 0.3),
      classifier = Some(model)))
    time("perplexity-only")(graft.operators.Curate.curate(
      corpus, bench, "doc_id", "text", base.copy(maxPerplexityBits = 5.2),
      lmRef = Some(bench)))
    time("span-only")(graft.operators.Curate.curate(
      corpus, bench, "doc_id", "text", base.copy(spanDedupN = Some(8))))
    time("full")(graft.operators.Curate.curate(
      corpus, bench, "doc_id", "text", fullCfg,
      lmRef = Some(bench), classifier = Some(model)))
    spark.stop()
  }
}
