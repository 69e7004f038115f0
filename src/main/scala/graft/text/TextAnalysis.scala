package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline.
  * All are pure column expressions (whole-stage codegen, no UDFs in the
  * hot path) so they fuse into a single pass over the corpus scan.
  */
object TextAnalysis {

  /** Raw (non-distinct) whitespace token array; empty/whitespace-only
    * text yields [] — a bare `split` would yield [""] and count a
    * phantom token. THE tokenizer definition: tokenCount and the
    * corpus-QC ops (repetition, packing) all derive from it, so their
    * token semantics cannot drift apart.
    */
  def rawTokens(text: Column): Column =
    when(length(trim(coalesce(text, lit("")))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count (0 for empty/whitespace-only text). */
  def tokenCount(text: Column): Column = size(rawTokens(text))

  /** BPE-ish subword count: words, numbers, punctuation runs, and
    * contractions counted as separate tokens (a cheap proxy for a GPT-2
    * style pre-tokenizer; the real BPE merge table is model-specific).
    *
    * Proxy semantics, precisely: the count of non-overlapping matches of
    * [[bpePattern]], left-to-right — i.e. GPT-2's pre-tokenization
    * WITHOUT the merge step. Real BPE only ever merges within a
    * pre-token, so this is an upper bound on word/number tokens but can
    * under-count long punctuation runs (a merge table splits them). Any
    * token budgeting built on it (packing, mixture weights) inherits
    * that approximation — see [[graft.operators.Packing]]. For exact
    * merge-table counts, use [[graft.text.Bpe]] (train + encode).
    */
  val bpePattern = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpePattern))

  /** English stopword subset used by quality scoring + language id. */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this")

  /** Fraction of tokens that are stopwords (0 when empty). */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hits = size(array_intersect(toks, typedLit(enStopwords))) // distinct hit kinds
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
        .cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite quality heuristic in [0,1]: long-enough, low punctuation,
    * some (but not all) stopwords, sane word lengths — the standard
    * pre-training quality-filter shape.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val wordScore = when(meanTokenLen(text).between(2.0, 12.0), 1.0).otherwise(0.3)
    round(lenScore * 0.4 + punctScore * 0.4 + wordScore * 0.2, 6)
  }

  /** Tiny n-gram/stopword language detector: scores each candidate
    * language by distinct-stopword hits and returns the argmax
    * ("und" when nothing matches). Deliberately tiny: real language ID
    * would broadcast larger profiles — the *shape* (map-side scoring, no
    * shuffle) is what matters at 100 TB.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> enStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "en", "por"))

  def langId(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      (lang, size(array_intersect(toks, typedLit(words))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // reverse fold builds when(en)...when(es).otherwise("und") with the
    // alphabetically-FIRST language outermost, so ties resolve to it —
    // without comparing the accumulator to "und" (which on the first
    // iteration is lit("und") and logs Spark's trivially-true-predicate
    // warning on every query)
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, score)) =>
      when(score > 0 && score === best, lit(lang)).otherwise(acc)
    }
  }

  /** Normalized-content fingerprint (lowercase, collapse whitespace) —
    * the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling polynomial fingerprint (base-31 over chars, like
    * java.lang.String.hashCode widened to 64 bits) — cheap locality-free
    * hash for shingle tables where md5 is overkill. Backed by the native
    * codegen'd [[graft.functions.RollingHash64Expr]], not a UDF.
    */
  def rollingHash64(c: Column): Column =
    graft.functions.GraftFunctions.rolling_hash64(c)

  /** Normalized 64-bit content fingerprint (rolling-hash analog of
    * [[fingerprint]]).
    */
  def rollingFingerprint(c: Column): Column =
    rollingHash64(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Standard cleaning chain for corpus curation: Unicode NFC (native
    * expression), control-character and URL stripping, whitespace
    * collapse. Map-only, fully codegen'd.
    */
  def cleanText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          graft.functions.NormalizeNfcExpr.normalize_nfc(c),
          "https?://\\S+", " "),
        "[\\p{Cntrl}]", " "),
      "\\s+", " "))

  // -------------------------------------------------------- line filtering
  /** C4/Gopher-style line-level filter: keep only lines with at least
    * `minWords` whitespace words, rejoined with newlines (docs whose
    * every line fails collapse to the empty string — callers gate on
    * token count downstream as usual). Map-only higher-order filter
    * over the line split; no shuffle.
    */
  def filterLines(text: Column, minWords: Int): Column =
    array_join(
      // count NON-EMPTY segments: a bare size(split(trim(l))) keeps a
      // leading empty token when the line starts with regex-whitespace
      // trim doesn't strip (tab/CR) and a trailing one (split limit
      // -1), inflating the count — and the empty-segment filter also
      // subsumes the blank-line special case
      filter(split(coalesce(text, lit("")), "\n"), l =>
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWords),
      "\n")

  // ------------------------------------------------------------- tf-idf
  /** Per-document top-k salient terms by a log-free tf-idf variant:
    * score = tf / (df + 1) — term frequency damped by document
    * frequency. The classic `tf·ln(N/df)` weighting is deliberately
    * avoided on this compared surface: `ln` is not guaranteed
    * correctly-rounded and differs by ulps across engines, while this
    * rational form is one exact IEEE division, so the DuckDB oracle
    * matches it bit-for-bit. Ranking ties break by term (ascending) —
    * deterministic under any partitioning.
    *
    * Scale shape: explode -> ONE (id, term) agg shuffle with map-side
    * partials, a vocabulary-sized df aggregation, a term join (AQE
    * broadcasts the df dim when it fits), and the per-doc top-k
    * window on the id key. No driver actions, no all-pairs anything.
    */
  def tfIdfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val toks = filter(
      split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
      t => length(t) > 0)
    val tf = df.select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score", col("tf").cast("double") / (col("df") + 1))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Deterministic hashed set-of-words embedding (the feature-hashing
    * trick, Weinberger et al. 2009, over the distinct-token set): each
    * token md5-hashes to one of `dim` buckets with a ±1 sign, the doc's
    * vector is the L2-normalized signed bucket histogram. This is the
    * bridge from raw TEXT into the embedding family — cosine near-dup,
    * ANN top-k, and SemDeDup run unchanged on corpora that ship no
    * vectors. Properties that matter at scale:
    *  - map-only: the native codegen'd
    *    [[graft.functions.HashedEmbedExpr]] over [[TokensExpr]] tokens —
    *    one md5 per distinct token, one O(dim) pass per doc, no
    *    shuffle, no trained state, no UDF, no per-row allocations
    *    beyond the output (round 8: replaces an interpreted HOF fold
    *    chain measured at ~1.6 ms/doc; bit-identical, pinned by
    *    NativeExprSpec against the retained HOF reference form);
    *  - md5-derived bucket+sign (like the minhash family), so every
    *    value is reproducible in any engine — the DuckDB oracle checks
    *    the float vectors bit-for-bit (pure IEEE division + float cast,
    *    no decimal-rounding boundary to straddle);
    *  - docs with no/null text embed as the zero vector (callers
    *    filter — cosine against zero is undefined and scored 0
    *    downstream).
    */
  def hashedEmbeddings(df: DataFrame, idCol: String, textCol: String,
                       dim: Int = 64): DataFrame =
    df.select(col(idCol),
      graft.functions.HashedEmbedExpr.hashed_embed(
        graft.functions.TokensExpr.tokens(
          coalesce(col(textCol), lit(""))), dim).as("embedding"))

  /** The pre-round-8 higher-order-function form of [[hashedEmbeddings]]
    * — retained as the PARITY REFERENCE the native expression is pinned
    * against (NativeExprSpec asserts bit-identical vectors over the
    * corpus and on edge cases). Not for production use: every lambda
    * below evaluates interpreted.
    */
  private[graft] def hashedEmbeddingsHof(df: DataFrame, idCol: String,
                                         textCol: String,
                                         dim: Int): DataFrame = {
    // null text folds like the empty token set (zero vector) — the
    // documented contract; without the coalesce the null propagates
    // through the fold and the row embeds as NULL
    val toks = coalesce(graft.functions.TokensExpr.tokens(col(textCol)),
      array().cast("array<string>"))
    val pairs = transform(toks, w => {
      val h = md5(w)
      struct(
        (conv(substring(h, 1, 8), 16, 10).cast("long") % dim)
          .cast("int").as("b"),
        when(conv(substring(h, 9, 1), 16, 10).cast("int") < 8, lit(1.0))
          .otherwise(lit(-1.0)).as("s"))
    })
    // staged projections so the signed-histogram fold and the norm each
    // evaluate ONCE per row: inlining `norm` into the per-element
    // division lambda would re-run its aggregate per element (O(dim²)),
    // and CollapseProject's non-cheap-expression guard keeps these
    // stages from being merged back into that shape
    df.select(col(idCol),
        aggregate(pairs, array_repeat(lit(0.0), dim),
          (acc, p) => transform(acc, (v, i) =>
            when(p.getField("b") === i, v + p.getField("s"))
              .otherwise(v))).as("_hist"))
      .select(col(idCol), col("_hist"),
        sqrt(aggregate(col("_hist"), lit(0.0), (a, v) => a + v * v))
          .as("_norm"))
      .select(col(idCol),
        when(col("_norm") === 0.0,
            transform(col("_hist"), v => v.cast("float")))
          .otherwise(
            transform(col("_hist"), v => (v / col("_norm")).cast("float")))
          .as("embedding"))
  }

  /** Convenience: attach the standard analysis columns. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpe_tokens", bpeTokenCount(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_id", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
