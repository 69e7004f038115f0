package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level quality control for a pre-training data pipeline:
  * repetition rules, benchmark-contamination scoring, and PII scrubbing.
  * The per-document operators are pure column expressions (one codegen'd
  * pass over the corpus scan, map-only at any scale); contamination is
  * the one join-shaped op — a broadcast hash join against the benchmark
  * n-gram set plus one aggregation shuffle on the doc id.
  */
object CorpusQc {

  /** One tokenizer definition for the whole text family — see
    * [[TextAnalysis.rawTokens]].
    */
  def rawTokens(text: Column): Column = TextAnalysis.rawTokens(text)

  /** Gopher/MassiveText-style repetition signals (Rae et al. 2021,
    * §A1.1) for word n-grams of width `ns` (defaults 1..3), per document:
    *
    *  - `dup_{n}gram_frac`: fraction of the document's overlapping
    *    n-grams that are repeats of an earlier one
    *    (`1 - distinct/total`; 0 for documents shorter than n tokens);
    *  - `top_{n}gram_frac`: character mass of the dominant n-gram
    *    (max over grams of `count * chars`, [[graft.functions.TopGramCharsExpr]])
    *    divided by the document's character length. Occurrences OVERLAP
    *    for n > 1, so a pathologically repetitive doc can score > 1 —
    *    fine for a threshold filter, deterministic without a tiebreak.
    *
    * Fractions are rounded to 6 places so results are bit-stable across
    * engines. All columns compute in ONE whole-stage-codegen projection —
    * no shuffle, no UDF: the natural pre-filter shape at 100 TB.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    val cols = ns.flatMap { n =>
      Seq(dupGramFrac(col(textCol), n).as(s"dup_${n}gram_frac"),
        topGramFrac(col(textCol), n).as(s"top_${n}gram_frac"))
    }
    df.select(col(idCol) +: size(rawTokens(col(textCol))).as("n_tokens") +:
      cols: _*)
  }

  /** `dup_{n}gram_frac` as a bare column (the [[repetitionStats]]
    * signals, usable directly in a filter — [[graft.operators.Curate]]).
    */
  def dupGramFrac(text: Column, n: Int): Column = {
    val toks = rawTokens(text)
    val total = size(toks) - (n - 1) // overlapping n-grams when nToks >= n
    val distinctN = size(graft.functions.ShinglesExpr.shingles(toks, n))
    when(total > 0, round(lit(1.0) - distinctN.cast("double") / total, 6))
      .otherwise(lit(0.0))
  }

  /** `top_{n}gram_frac` as a bare column — see [[repetitionStats]]. */
  def topGramFrac(text: Column, n: Int): Column = {
    val chars = length(coalesce(text, lit("")))
    when(chars > 0,
      round(graft.functions.TopGramCharsExpr.topGramChars(rawTokens(text), n)
        .cast("double") / chars, 6))
      .otherwise(lit(0.0))
  }

  /** Benchmark-contamination scoring (the GPT-3 style n-gram overlap
    * check): for every corpus document, the fraction of its DISTINCT
    * word n-grams that also occur anywhere in `benchmark`. Documents
    * with fewer than n tokens score 0 over 0 grams.
    *
    * Plan shape for 100 TB: the benchmark side (eval sets are tiny
    * relative to a corpus) collapses to a distinct n-gram dim that
    * broadcasts; the corpus explodes its shingles map-side into the
    * broadcast probe, and the only shuffle is the per-doc count
    * aggregation. Nothing is quadratic and the corpus is scanned once.
    */
  def contaminationScores(corpus: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(graft.dedup.Dedup.shingles(col(textCol), n)).as("_gram"))
      .distinct()
    val docGrams = corpus.select(col(idCol),
      graft.dedup.Dedup.shingles(col(textCol), n).as("_grams"))
    docGrams
      .select(col(idCol), size(col("_grams")).as("n_grams"),
        explode_outer(col("_grams")).as("_gram"))
      .join(broadcast(benchGrams.withColumn("_hit", lit(1))),
        Seq("_gram"), "left")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(col("_hit")).as("n_contaminated"))
      .withColumn("contamination_frac",
        when(col("n_grams") > 0,
          round(col("n_contaminated").cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)))
  }

  /** PII scrub patterns — portable across Java regex (Spark) and RE2
    * (DuckDB/production scrubbers): no backrefs, no lookaround.
    * Application order matters: emails first (their domains would
    * otherwise feed the phone pattern's digit runs), then IPs (dotted
    * digits), then phones.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phonePattern = "\\+?\\d[\\d\\-() ]{6,}\\d"

  /** Redact emails, IPv4 addresses and phone-like digit runs. One
    * codegen'd projection (regexp_replace chain), map-only.
    */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Temperature-scaled domain mixture weights (the mT5/XLM-R sampling
    * rule, Conneau et al. 2020 §3.1): given a per-doc weight column
    * (token counts), compute each domain's share p_d of the corpus and
    * the resampling weight p_d^alpha / sum(p^alpha). alpha < 1 upsamples
    * low-resource domains; alpha = 1 is proportional sampling.
    *
    * When the weight column is
    * [[graft.text.TextAnalysis.bpeTokenCount]], remember it is a
    * pre-tokenizer regex PROXY for real BPE (see its scaladoc) — the
    * mixture is then approximate in the same way the packing budget is.
    *
    * Scale: ONE map-side-combined aggregation shuffle on the domain key
    * reduces the corpus to #domains rows, and that aggregation appears
    * in the plan exactly ONCE: the #domains rows collapse to a single
    * sorted array row, the two corpus-wide totals are deterministic
    * array folds over it, and the rows explode back out. (A global
    * window over the reduced frame computes the same thing but logs
    * Spark's "No Partition Defined ... single partition" warning on
    * every run; a crossJoin of self-aggregates references the corpus
    * aggregation up to 4x and gambles on exchange reuse, which this
    * repo has measured failing across re-aliased self-joins. Domain
    * counts are small by construction — languages, sources — so the
    * one-row array is dozens of entries, never data.)
    */
  def mixtureWeights(df: DataFrame, domainCol: String, weightCol: String,
                     alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    val ds = col("_ds")
    val tokens = (x: Column) => x.getField("domain_tokens").cast("double")
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol)).cast("long").as("domain_tokens"))
      // sort_array: a deterministic fold order for the double sums
      .agg(sort_array(collect_list(struct(
        col(domainCol).as("_d"), col("n_docs"), col("domain_tokens"))))
        .as("_ds"))
      .withColumn("_tot", aggregate(ds, lit(0.0), (a, x) => a + tokens(x)))
      .withColumn("_pa_tot", aggregate(ds, lit(0.0),
        (a, x) => a + pow(tokens(x) / col("_tot"), lit(alpha))))
      .select(explode(ds).as("_x"), col("_tot"), col("_pa_tot"))
      .select(col("_x._d").as(domainCol),
        col("_x.n_docs").as("n_docs"),
        col("_x.domain_tokens").as("domain_tokens"),
        round(col("_x.domain_tokens").cast("double") / col("_tot"), 6)
          .as("share"),
        round(pow(col("_x.domain_tokens").cast("double") / col("_tot"),
          lit(alpha)) / col("_pa_tot"), 6).as("mix_weight"))
  }

  /** Per-language corpus data card — the summary table a dataset release
    * ships (Gebru et al., "Datasheets for Datasets"): doc/source counts,
    * token and character totals, mean and exact median doc length. ONE
    * aggregation pass over the corpus keyed on the language (map-side
    * combined; `percentile` is exact-interpolated and order-independent,
    * `count distinct` expands to the standard two-phase plan). At 100 TB
    * the output is #languages rows — the cheapest summary worth keeping
    * current after every curation stage.
    */
  def dataCard(df: DataFrame, langCol: String, sourceCol: String,
               textCol: String): DataFrame = {
    val nToks = TextAnalysis.tokenCount(col(textCol))
    df.select(col(langCol), col(sourceCol), nToks.as("_nt"),
        length(coalesce(col(textCol), lit(""))).as("_nc"))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col(sourceCol)).as("n_sources"),
        sum(col("_nt")).as("total_tokens"),
        sum(col("_nc")).as("total_chars"),
        round(sum(col("_nt")) / count(lit(1)), 6).as("avg_tokens"),
        percentile(col("_nt"), lit(0.5)).as("median_tokens"))
  }

  /** Sketch-based per-group corpus statistics — the 100 TB form of "how
    * many distinct X per group, how are sizes distributed". The distinct
    * count is HLL++ (`approx_count_distinct`): bounded registers
    * map-side, max-merge (commutative, associative, idempotent), so the
    * estimate is independent of partitioning and arrival order —
    * DETERMINISTIC and digest-pinnable, unlike a sampled estimate. The
    * percentiles are the EXACT aggregate on an integer size column: its
    * buffer holds one entry per distinct VALUE (bounded by the value
    * range of a size-like column, not the corpus), the same boundedness
    * argument [[graft.text.NgramLm.perplexityBuckets]] relies on.
    * `percentile_approx` is the tool for genuinely unbounded value
    * domains, but its Greenwald-Khanna merge is arrival-order-dependent
    * — two identical runs can disagree in the last summary entry — so
    * this op deliberately avoids it on the pinned surface.
    *
    * Scale shape: ONE aggregation shuffle on the group key; every
    * aggregate carries partial state (counts, HLL registers,
    * value-count maps) map-side.
    */
  def sketchStats(df: DataFrame, groupCol: String, key: Column,
                  size: Column, rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        approx_count_distinct(key, rsd).as("approx_distinct"),
        sum(size).cast("long").as("total_size"),
        percentile(size, array(lit(0.5), lit(0.9), lit(0.99)))
          .as("size_percentiles"))
}
