package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style perplexity filtering: score every document by a bigram
  * language model trained on a reference slice of the corpus, so the
  * high-perplexity tail (boilerplate, garbled extraction, wrong-language
  * noise) can be cut with a plain filter on the score.
  *
  * Model, precisely (kept deliberately simple so the DuckDB oracle can
  * replicate it bit-for-bit):
  *  - tokens: lowercased whitespace tokens ([[TextAnalysis.rawTokens]]
  *    over `lower(text)` — THE tokenizer, shared with every corpus op);
  *  - counts from the reference corpus: `c2(w1,w2)` = bigram
  *    occurrences, `c1(w1)` = occurrences of `w1` as a bigram CONTEXT
  *    (i.e. every position except each doc's last token), `V` = distinct
  *    token count over all reference positions;
  *  - add-one smoothing: P(w2|w1) = (c2+1)/(c1+V). Unseen contexts
  *    degrade to the uniform 1/V through the same formula — no special
  *    cases, which is what makes the oracle a three-way left join;
  *  - per-transition cost = round(-log2(P), 6) summed as DECIMAL(18,6)
  *    (bit-deterministic under any partitioning / evaluation order),
  *    score = round(sum/n, 6) bits per transition. Perplexity is
  *    2^score; the filter threshold is stated in bits so no pow() enters
  *    the compared result.
  *
  * Scale shape at 100 TB:
  *  - training is two map-side-combined aggregations over the REFERENCE
  *    slice only (one keyed on the bigram, one on the context token) —
  *    the model tables are vocabulary-sized, not corpus-sized;
  *  - `V` rides the unigram pass as a 1-row frame joined back by
  *    broadcast (the [[Ranking]] stats pattern);
  *  - scoring explodes transitions map-side (zip of two slices — no
  *    join to build pairs) and joins the count tables on their keys.
  *    The joins are declared as plain equi-joins: AQE turns them into
  *    broadcasts when the trained model is small (sf scale, and any
  *    corpus with a bounded vocabulary) and keeps shuffle joins when a
  *    100 TB vocabulary genuinely doesn't fit an executor — no
  *    hand-rolled size switch to get wrong;
  *  - final per-doc aggregation is one shuffle on doc_id.
  *
  * The reference pipeline has no statistical filter (its QC is
  * rule-based, `GoNonratAnnotationPipeline.java` filters at field
  * level); this is part of the LLM-curation extension family
  * (BASELINE.json north-star), after CCNet (Wenzek et al., 2019).
  */
object NgramLm {

  /** Bigram-count model over `ref`: (bigrams, contexts, vocab-as-1-row).
    * All three are lazy plans — callers decide caching; [[perplexity]]
    * wires them straight into the scoring joins.
    */
  def train(ref: DataFrame, textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val toks = TextAnalysis.rawTokens(lower(col(textCol)))
    val t = ref.select(toks.as("_t")).filter(size(col("_t")) >= 1)
    // transitions: zip(t[0..n-2], t[1..n-1]) — map-side, no generator join
    val trans = t.filter(size(col("_t")) >= 2)
      .select(slice(col("_t"), lit(1), size(col("_t")) - 1).as("_h"),
        slice(col("_t"), lit(2), size(col("_t")) - 1).as("_n"))
      .select(explode(arrays_zip(col("_h"), col("_n"))).as("_tr"))
      .select(col("_tr._h").as("w1"), col("_tr._n").as("w2"))
    val bigrams = trans.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val contexts = trans.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = t.select(explode(col("_t")).as("_w"))
      .agg(count_distinct(col("_w")).as("_vocab"))
    (bigrams, contexts, vocab)
  }

  /** Score `target` docs (those with >= 2 tokens — a doc with no
    * transition has no defined perplexity) against a model trained on
    * `ref`. Returns (idCol, n_trans, sum_nll, avg_nll): `sum_nll` is the
    * EXACT decimal total (bit-deterministic, and what the cross-engine
    * oracle compares — a rounded double average can straddle a
    * half-even boundary the two engines' round() implementations break
    * differently, measured once in 450 docs at sf0.01); `avg_nll` =
    * round(sum/n, 6) bits per transition is the score consumers filter
    * on.
    */
  def perplexity(ref: DataFrame, target: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val (bigrams, contexts, vocab) = train(ref, textCol)
    val toks = TextAnalysis.rawTokens(lower(col(textCol)))
    val trans = target.select(col(idCol), toks.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col(idCol),
        slice(col("_t"), lit(1), size(col("_t")) - 1).as("_h"),
        slice(col("_t"), lit(2), size(col("_t")) - 1).as("_n"))
      .select(col(idCol), explode(arrays_zip(col("_h"), col("_n"))).as("_tr"))
      .select(col(idCol), col("_tr._h").as("w1"), col("_tr._n").as("w2"))
    val p = (coalesce(col("c2"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)) + col("_vocab"))
    trans
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(contexts, Seq("w1"), "left")
      .crossJoin(vocab) // 1-row broadcast
      .select(col(idCol),
        round(-log2(p), 6).cast("decimal(18,6)").as("_nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("_nll")).as("sum_nll"))
      .withColumn("avg_nll",
        round(col("sum_nll").cast("double") / col("n_trans"), 6))
  }

  /** The filter itself: keep target docs scoring at most `maxBits` bits
    * per transition (CCNet keeps the low-perplexity head). Docs with
    * fewer than 2 tokens carry no evidence either way and are dropped —
    * the rule-based QC gate is the operator that judges degenerate docs.
    */
  def perplexityFilter(ref: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, maxBits: Double): DataFrame =
    perplexity(ref, target, idCol, textCol)
      .filter(col("avg_nll") <= maxBits)

  /** CCNet's actual gate shape: head/middle/tail buckets at corpus
    * QUANTILES of the perplexity score, not a fixed bits threshold. A
    * fixed threshold silently empties when the vocabulary grows — the
    * add-one unseen mass shifts EVERY score up (measured: the r7 100×
    * curate fan-out probe pushed all docs past a threshold tuned at 1×,
    * zero survivors) — while the quantile form keeps the same corpus
    * fraction per bucket by construction, at any scale.
    *
    * Takes the OUTPUT of [[perplexity]] so the caller owns caching (the
    * scored frame feeds both the threshold aggregation and the bucket
    * assignment; persist it or pay the scoring subtree twice — the
    * curate() manifest lesson).
    *
    * Determinism across engines: buckets cut on `nll_micro` =
    * `(sum_nll × 1e6) div n_trans` — integer micro-bits derived from
    * the exact decimal total with integer division, so the bucketing
    * score carries none of the double-rounding boundary risk the
    * rounded `avg_nll` column documents. Thresholds are EXACT
    * percentiles: the aggregation buffers one entry per DISTINCT
    * integer score (bounded by the micro-bits value range, ~tens of
    * millions, regardless of corpus size), so exact mode survives
    * 100 TB where a value-per-row buffer would not; the 1-row
    * threshold frame broadcasts back (the Ranking stats pattern).
    */
  def perplexityBuckets(scored: DataFrame, loQ: Double = 1.0 / 3,
                        hiQ: Double = 2.0 / 3): DataFrame = {
    val withMicro = scored.withColumn("nll_micro",
      expr("CAST(sum_nll * 1000000 AS BIGINT) div n_trans"))
    val thr = withMicro.agg(
      expr(s"percentile(nll_micro, ${loQ}d)").as("_lo"),
      expr(s"percentile(nll_micro, ${hiQ}d)").as("_hi"))
    withMicro.crossJoin(thr) // 1-row broadcast
      .withColumn("ppl_bucket",
        when(col("nll_micro") <= col("_lo"), "head")
          .when(col("nll_micro") <= col("_hi"), "middle")
          .otherwise("tail"))
      .drop("_lo", "_hi")
  }
}
