package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Packing, Sampling}
import graft.text.{CorpusQc, TextAnalysis}

/** Corpus-QC extension queries (BASELINE.json north-star, round 4):
  * repetition rules, contamination scoring, PII scrubbing, deterministic
  * sampling, and sequence packing — the remaining operations a
  * pre-training data pipeline runs that the earlier packs didn't cover.
  * Every query here has a full DuckDB oracle.
  */
object CorpusQueries extends QueryPack {

  /** Benchmark split for the contamination check: every 50th doc plays
    * the role of an eval set; the rest are the corpus under test.
    */
  private val benchMod = 50
  private val contaminationN = 8

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher-style repetition signals, one codegen'd pass (n = 1..3)
    "text_repetition" -> ((s, d) => {
      CorpusQc.repetitionStats(Tables.documents(s, d), "doc_id", "text")
    }),

    // GPT-3 style benchmark-contamination: distinct 8-gram overlap of
    // each corpus doc against the benchmark docs' gram set
    "text_contamination" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      CorpusQc.contaminationScores(
        docs.filter(pmod($"doc_id", lit(benchMod)) =!= 0),
        docs.filter(pmod($"doc_id", lit(benchMod)) === 0),
        "doc_id", "text", contaminationN)
    }),

    // PII scrub over text with deterministically injected synthetic PII
    // (the corpus itself is clean words — injection keeps the oracle
    // non-vacuous: every row exercises all three redaction patterns)
    "text_pii_scrub" -> ((s, d) => {
      import s.implicits._
      val dirty = concat(
        substring($"text", 1, 40),
        lit(" contact u"), $"doc_id", lit("@example.com ping 10."),
        pmod($"doc_id", lit(256)), lit(".0.7 call +1-555-"),
        lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"), lit(" end"))
      Tables.documents(s, d)
        .select($"doc_id", CorpusQc.piiScrub(dirty).as("scrubbed"))
    }),

    // deterministic content-hash Bernoulli sample, ~10.2% (0x1a/0x100)
    "sample_hash" -> ((s, d) => {
      import s.implicits._
      Sampling.hashSample(Tables.documents(s, d), $"doc_id", "1a")
        .select($"doc_id", $"lang")
    }),

    // per-stratum rates as a codegen'd CASE filter (no join): en kept at
    // 25%, de at 75%, all other languages dropped
    "sample_stratified" -> ((s, d) => {
      import s.implicits._
      Sampling.stratifiedHashSample(Tables.documents(s, d), $"doc_id",
          $"lang", Map("en" -> "40", "de" -> "c0"))
        .select($"doc_id", $"lang")
    }),

    // mixture-rate application: deterministic per-language resampling
    // with upsampling (de x2.25) and downsampling (en x0.5, es x0.75) on
    // the same content-hash family; `epoch` = copy index. zh unlisted ->
    // dropped (the mixtureWeights -> loader handoff, materialized)
    "sample_resample_mix" -> ((s, d) => {
      import s.implicits._
      Sampling.resampleByRates(Tables.documents(s, d), $"doc_id", $"lang",
        Map("en" -> 0.5, "de" -> 2.25, "fr" -> 1.0, "es" -> 0.75))
        .select($"doc_id", $"lang", $"epoch")
    }),

    // deterministic 80/10/10 train/val/test assignment on the same
    // content-hash family as sample_hash
    "sample_split" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select($"doc_id",
        Sampling.assignSplit($"doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    }),

    // concat-and-chunk sequence packing: 2048-token budget, 16 buckets
    "pack_sequences" -> ((s, d) => {
      import s.implicits._
      Packing.packChunks(
        Tables.documents(s, d)
          .select($"doc_id", TextAnalysis.tokenCount($"text").as("n_tokens")),
        "doc_id", "n_tokens", budget = 2048, buckets = 16)
    }),

    // sketch-first corpus stats. The compared surface is the portable
    // scalar projection (counts, sums, exact interpolated percentiles —
    // all engine-exact, so a full DuckDB oracle applies); the HLL++
    // estimate is engine-specific and rides the separate no-oracle
    // `corpus_sketch_hll` surface (digest-pinned in GoldenDigestsSpec,
    // error bound vs exact asserted in CorpusOpsSpec)
    "corpus_sketch_stats" -> ((s, d) => {
      import s.implicits._
      CorpusQc.sketchStats(Tables.documents(s, d), "source",
          TextAnalysis.fingerprint($"text"), $"n_chars")
        .select($"source", $"n_rows", $"total_size",
          element_at($"size_percentiles", 1).as("p50"),
          element_at($"size_percentiles", 2).as("p90"),
          element_at($"size_percentiles", 3).as("p99"))
    }),

    "corpus_sketch_hll" -> ((s, d) => {
      import s.implicits._
      CorpusQc.sketchStats(Tables.documents(s, d), "source",
          TextAnalysis.fingerprint($"text"), $"n_chars")
        .select($"source", $"approx_distinct")
    }),

    // deterministic balanced delivery sharding (WebDataset-style): every
    // doc's shard id as a pure function of its content digest, plus the
    // per-shard manifest a loader plans from
    "pack_shard_assign" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select($"doc_id",
        Packing.assignShard($"doc_id", nShards = 16).as("shard"))
    }),

    // shard write -> read-back ROUNDTRIP (round 8): writeShards to a
    // temp dir, read the partitioned tree back, and aggregate per
    // shard. The DuckDB oracle recomputes the same per-shard stats
    // straight from the base table AND pins n_files = 1 — the
    // one-task-per-shard-directory layout contract (repartition before
    // partitionBy) — so the file-layout behavior itself is
    // oracle-checked, not just the assignment arithmetic.
    "pack_shard_roundtrip" -> ((s, d) => {
      import s.implicits._
      val tmpPath = java.nio.file.Files
        .createTempDirectory("graft_shard_roundtrip")
      try {
        graft.operators.Packing.writeShards(
          Tables.documents(s, d).select($"doc_id", $"n_chars"),
          $"doc_id", nShards = 16, tmpPath.toString)
        val agg = s.read.parquet(tmpPath.toString)
          .withColumn("_file", input_file_name()) // staged: not allowed
          .groupBy($"shard")                      // directly inside an agg
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").cast("long").as("total_size"),
            countDistinct($"_file").as("n_files"))
        // shard-count-bounded result copied out so the temp tree can be
        // deleted before returning (a lazy frame would pin the files)
        val rows = agg.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
      } finally Tables.deleteTree(tmpPath)
    }),

    "pack_shard_manifest" -> ((s, d) => {
      import s.implicits._
      Packing.shardManifest(Tables.documents(s, d), $"doc_id",
        length($"text"), nShards = 16)
    }),

    // sequence ASSEMBLY: the record a data loader actually reads — texts
    // concatenated in id order per (bucket, seq); one exchange total
    // (the assembly groupBy reuses the window's bucket partitioning)
    "pack_assemble" -> ((s, d) => {
      import s.implicits._
      Packing.assemble(
        Tables.documents(s, d)
          .select($"doc_id", $"text",
            TextAnalysis.tokenCount($"text").as("n_tokens")),
        "doc_id", "text", "n_tokens", budget = 2048, buckets = 16)
    }),

    // the same packing arithmetic at the BPE-proxy boundary: pins the
    // proxy's regex semantics (TextAnalysis.bpePattern) exactly where
    // token budgeting consumes it — DuckDB re-counts the same pattern
    // and re-runs the running-sum chunk assignment on those counts
    "pack_bpe_sequences" -> ((s, d) => {
      import s.implicits._
      Packing.packChunks(
        Tables.documents(s, d)
          .select($"doc_id",
            TextAnalysis.bpeTokenCount($"text").as("n_tokens")),
        "doc_id", "n_tokens", budget = 2048, buckets = 16)
    }),

    // End-to-end curation flagship (the LLM-pipeline analog of
    // gaf_pipeline_e2e): QC/repetition gates -> exact dedup -> LSH
    // clustering -> contamination gate -> split -> per-split packing,
    // all through graft.operators.Curate. Rows-only for the driver
    // (the LSH/union-find composition has no tractable SQL oracle);
    // digest-pinned in GoldenDigestsSpec, per-gate non-vacuity and the
    // fixed shuffle budget pinned in CorpusOpsSpec/PlanSpec.
    "corpus_curate_e2e" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      // contamination at n=3 / 0.06: the synthetic corpus's template
      // docs share almost no n>=4 grams (measured: 241 of 419 QC
      // survivors overlap the bench set at n=3, one at n=5), so 3-grams
      // are the scale where the gate is non-vacuous here — the
      // real-world default stays 8 (CurateConfig)
      graft.operators.Curate.curate(
          docs.filter(pmod($"doc_id", lit(benchMod)) =!= 0),
          docs.filter(pmod($"doc_id", lit(benchMod)) === 0),
          "doc_id", "text",
          graft.operators.Curate.CurateConfig(
            contaminationN = 3, maxContaminationFrac = 0.06))
        .select($"doc_id", $"lang", $"split", $"n_tokens",
          $"pack_bucket", $"pack_seq")
    }),

    // round 9: the classic composition with the two new bracketed
    // stages on — C4-style line-level filter (min 4 words per kept
    // line, applied before every doc-level gate) and keywords-on-card
    // (top-3 salient terms per kept doc on the output manifest). The
    // corpus ships no line structure, so lines are fabricated exactly
    // like text_line_filter's (break before every 'table' occurrence)
    // to keep the stage non-vacuous. The salient array flattens to one
    // row per (doc, rank) so the compared surface stays scalar (driver
    // comparator can't sort arrays). Rows-only; digest-pinned;
    // classic-config digests unchanged.
    "corpus_curate_lines_terms" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).withColumn("text",
        regexp_replace(coalesce($"text", lit("")), " table ", "\ntable "))
      graft.operators.Curate.curate(
          docs.filter(pmod($"doc_id", lit(benchMod)) =!= 0),
          docs.filter(pmod($"doc_id", lit(benchMod)) === 0),
          "doc_id", "text",
          graft.operators.Curate.CurateConfig(
            contaminationN = 3, maxContaminationFrac = 0.06,
            minLineWords = Some(4), salientTermsK = Some(3)))
        .select($"doc_id", $"lang", $"split", $"n_tokens",
          $"pack_bucket", $"pack_seq",
          posexplode_outer($"salient_terms").as(Seq("term_rank", "term")))
    }),

    // temperature-scaled language mixture weights (alpha = 0.3): the
    // sampling-rate table a multilingual pre-training run feeds its
    // data loader
    "corpus_mix_weights" -> ((s, d) => {
      import s.implicits._
      CorpusQc.mixtureWeights(
        Tables.documents(s, d)
          .select($"lang", TextAnalysis.tokenCount($"text").as("n_tokens")),
        "lang", "n_tokens", alpha = mixAlpha)
    }),

    // STAGE oracles for the curate() flagship: the composition itself is
    // digest-pinned (LSH/union-find has no tractable SQL), but its two
    // gate stages are SQL-expressible, so DuckDB checks them row-exactly
    // at the e2e's own config — the LLM flagship's analog of the GAF
    // pipeline's per-operator oracle rows.

    // stage 1: the QC/repetition gate exactly as corpus_curate_e2e runs
    // it (same predicate via Curate.qcPredicate, same train split)
    "curate_qc_gate" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .filter(pmod($"doc_id", lit(benchMod)) =!= 0)
        .filter(graft.operators.Curate.qcPredicate($"text", curateCfg))
        .select($"doc_id", TextAnalysis.tokenCount($"text").as("n_tokens"))
    }),

    // stage 2: the contamination gate at the e2e's n=3 / 0.06 config,
    // isolated on QC survivors (inside curate() it runs post-dedup,
    // which SQL can't reach; the gate LOGIC is identical)
    "curate_contamination_gate" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val qc = docs
        .filter(pmod($"doc_id", lit(benchMod)) =!= 0)
        .filter(graft.operators.Curate.qcPredicate($"text", curateCfg))
      CorpusQc.contaminationScores(
          qc.select($"doc_id", $"text"),
          docs.filter(pmod($"doc_id", lit(benchMod)) === 0),
          "doc_id", "text", curateCfg.contaminationN)
        .filter($"contamination_frac" <= curateCfg.maxContaminationFrac)
    })
  )

  /** The corpus_curate_e2e config (contamination n=3 / 0.06 — see that
    * query's scaladoc for why those are the non-vacuous values here).
    */
  private val curateCfg = graft.operators.Curate.CurateConfig(
    contaminationN = 3, maxContaminationFrac = 0.06)

  private val mixAlpha = 0.3

  // ---- DuckDB oracle forms ------------------------------------------
  private val toks = "string_split_regex(trim(text), '\\s+')"
  private def ntoks(t: String = toks) =
    s"(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0 ELSE len($t) END)"

  /** Overlapping word n-grams as a DuckDB list comprehension (empty when
    * the doc has fewer than n tokens — range(1, k) is empty for k <= 1).
    */
  private def grams(n: Int) =
    s"[array_to_string(($toks)[i:i+${n - 1}], ' ') " +
      s"for i in range(1, ${ntoks()} - ${n - 1} + 1)]"

  // the two repetition fractions as bare expressions, shared by the
  // text_repetition oracle and the curate QC-gate oracle so the gate's
  // "same shapes the proven oracles use" claim is true by construction
  private def dupFracExpr(n: Int): String = {
    val total = s"(${ntoks()} - ${n - 1})"
    s"""(CASE WHEN $total > 0
       |    THEN round(1.0 - len(list_distinct(${grams(n)})) / $total, 6)
       |    ELSE 0.0 END)""".stripMargin
  }
  private def topFracExpr(n: Int): String = {
    // max over grams of count*chars via DuckDB's histogram aggregate
    val topChars = "coalesce(list_max([length(e.key) * e.value " +
      s"for e in map_entries(list_aggregate(${grams(n)}, 'histogram'))]), 0)"
    s"""(CASE WHEN length(text) > 0
       |    THEN round($topChars / length(text), 6)
       |    ELSE 0.0 END)""".stripMargin
  }
  private def repCols(n: Int): String =
    s"""  ${dupFracExpr(n)} AS dup_${n}gram_frac,
       |  ${topFracExpr(n)} AS top_${n}gram_frac""".stripMargin

  // DuckDB form of Curate.qcPredicate at the e2e config (conditions in
  // the same shapes the proven text_quality_filter / text_repetition
  // oracles use; the two repetition fractions round(6) on BOTH engines
  // before comparing, mirroring dupGramFrac/topGramFrac)
  private def qcConds: String = {
    val ltoks = "string_split_regex(lower(trim(text)), '\\s+')"
    val en = TextAnalysis.enStopwords.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    val punct = """(CASE WHEN length(text) > 0
      |    THEN CAST(length(text) -
      |      length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |      / length(text) ELSE 0.0 END)""".stripMargin
    val stop = s"""(CASE WHEN len($ltoks) > 0
      |    THEN CAST(len(list_intersect($ltoks, $en)) AS DOUBLE) / len($ltoks)
      |    ELSE 0.0 END)""".stripMargin
    s"""${ntoks()} >= 20
       |  AND $punct < 0.1
       |  AND $stop > 0.0
       |  AND ${dupFracExpr(3)} <= 0.5
       |  AND ${topFracExpr(2)} <= 0.2""".stripMargin
  }

  override def oracleSql: Map[String, String] = Map(

    // exact-side of sketchStats: counts/sums are integers, the
    // percentiles are the exact interpolating aggregate — both engines
    // compute position = p*(n-1), then lo + frac*(hi-lo) in doubles, so
    // the values match bit-for-bit (no rounding on the surface)
    "corpus_sketch_stats" ->
      """SELECT source, count(*) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS total_size,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.9) AS p90,
        |  quantile_cont(n_chars, 0.99) AS p99
        |FROM documents GROUP BY source""".stripMargin,

    "curate_qc_gate" ->
      s"""SELECT doc_id, ${ntoks()} AS n_tokens FROM documents
         |WHERE doc_id % $benchMod <> 0 AND $qcConds""".stripMargin,

    "curate_contamination_gate" -> {
      val g3 = grams(3)
      s"""WITH bench AS (
         |  SELECT DISTINCT unnest(list_distinct($g3)) AS _gram
         |  FROM documents WHERE doc_id % $benchMod = 0
         |), docg AS (
         |  SELECT doc_id, list_distinct($g3) AS _grams
         |  FROM documents WHERE doc_id % $benchMod <> 0 AND $qcConds
         |), hits AS (
         |  SELECT doc_id, count(*) AS n_contaminated
         |  FROM (SELECT doc_id, unnest(_grams) AS _gram FROM docg)
         |  JOIN bench USING (_gram) GROUP BY doc_id
         |), scored AS (
         |  SELECT d.doc_id, len(d._grams) AS n_grams,
         |    coalesce(h.n_contaminated, 0) AS n_contaminated,
         |    CASE WHEN len(d._grams) > 0
         |      THEN round(coalesce(h.n_contaminated, 0) / len(d._grams), 6)
         |      ELSE 0.0 END AS contamination_frac
         |  FROM docg d LEFT JOIN hits h USING (doc_id)
         |)
         |SELECT * FROM scored WHERE contamination_frac <= 0.06""".stripMargin
    },

    "text_repetition" ->
      s"""SELECT doc_id, ${ntoks()} AS n_tokens,
         |${Seq(1, 2, 3).map(repCols).mkString(",\n")}
         |FROM documents""".stripMargin,

    "text_contamination" -> {
      val g8 = grams(contaminationN)
      s"""WITH bench AS (
         |  SELECT DISTINCT unnest(list_distinct($g8)) AS _gram
         |  FROM documents WHERE doc_id % $benchMod = 0
         |), docg AS (
         |  SELECT doc_id, list_distinct($g8) AS _grams
         |  FROM documents WHERE doc_id % $benchMod <> 0
         |), hits AS (
         |  SELECT doc_id, count(*) AS n_contaminated
         |  FROM (SELECT doc_id, unnest(_grams) AS _gram FROM docg)
         |  JOIN bench USING (_gram) GROUP BY doc_id
         |)
         |SELECT d.doc_id, len(d._grams) AS n_grams,
         |  coalesce(h.n_contaminated, 0) AS n_contaminated,
         |  CASE WHEN len(d._grams) > 0
         |    THEN round(coalesce(h.n_contaminated, 0) / len(d._grams), 6)
         |    ELSE 0.0 END AS contamination_frac
         |FROM docg d LEFT JOIN hits h USING (doc_id)""".stripMargin
    },

    "text_pii_scrub" ->
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(
         |    substring(text, 1, 40) || ' contact u' || doc_id ||
         |      '@example.com ping 10.' || (doc_id % 256) || '.0.7 call +1-555-' ||
         |      lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' end',
         |    '${CorpusQc.emailPattern}', '<EMAIL>', 'g'),
         |    '${CorpusQc.ipv4Pattern}', '<IP>', 'g'),
         |    '${CorpusQc.phonePattern}', '<PHONE>', 'g') AS scrubbed
         |FROM documents""".stripMargin,

    "sample_hash" ->
      "SELECT doc_id, lang FROM documents WHERE md5(doc_id::VARCHAR) < '1a'",

    // unlisted strata: the CASE yields NULL, the comparison is NULL ->
    // row dropped, mirroring the Spark CASE-chain's null default
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE md5(doc_id::VARCHAR) <
        |  CASE lang WHEN 'en' THEN '40' WHEN 'de' THEN 'c0' END""".stripMargin,

    // thresholds = hex8 of the fractional rate parts: 0.5 -> 80000000,
    // 0.25 -> 40000000, 0.75 -> c0000000 (same arithmetic as hex8)
    "sample_resample_mix" ->
      """WITH n AS (
        |  SELECT doc_id, lang,
        |    CASE lang
        |      WHEN 'en' THEN
        |        CASE WHEN md5(doc_id::VARCHAR) < '80000000' THEN 1 ELSE 0 END
        |      WHEN 'de' THEN
        |        2 + CASE WHEN md5(doc_id::VARCHAR) < '40000000' THEN 1 ELSE 0 END
        |      WHEN 'fr' THEN 1
        |      WHEN 'es' THEN
        |        CASE WHEN md5(doc_id::VARCHAR) < 'c0000000' THEN 1 ELSE 0 END
        |      ELSE 0 END AS n
        |  FROM documents)
        |SELECT doc_id, lang, CAST(copy AS INT) AS epoch
        |FROM n CROSS JOIN generate_series(1, 3) t(copy)
        |WHERE copy <= n""".stripMargin,

    // thresholds = round(cum * 16^8) in hex: 0.8 -> cccccccd, 0.9 ->
    // e6666666 (same arithmetic as Sampling.hex8)
    "sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN md5(doc_id::VARCHAR) < 'cccccccd' THEN 'train'
        |       WHEN md5(doc_id::VARCHAR) < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "pack_sequences" ->
      s"""SELECT doc_id, ${ntoks()} AS n_tokens,
         |  (doc_id % 16)::INT AS pack_bucket,
         |  floor((sum(${ntoks()}) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id)
         |         - ${ntoks()}) / 2048)::BIGINT AS pack_seq
         |FROM documents""".stripMargin,

    "pack_shard_assign" ->
      """SELECT doc_id,
        |  CAST(floor(('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |    * 16 / 4294967296.0) AS INT) AS shard
        |FROM documents""".stripMargin,

    // nonempty shards only (an empty shard writes no directory);
    // n_files = 1 is the layout contract the roundtrip pins
    "pack_shard_roundtrip" ->
      """SELECT
        |  CAST(floor(('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |    * 16 / 4294967296.0) AS INT) AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_size,
        |  CAST(1 AS BIGINT) AS n_files
        |FROM documents GROUP BY 1""".stripMargin,

    // dense over all 16 shards (empty shards report 0/0 explicitly)
    "pack_shard_manifest" ->
      """WITH g AS (
        |  SELECT
        |    CAST(floor(('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      * 16 / 4294967296.0) AS INT) AS shard,
        |    count(*) AS n_docs,
        |    CAST(sum(length(text)) AS BIGINT) AS total_size
        |  FROM documents GROUP BY 1)
        |SELECT CAST(s.i AS INT) AS shard,
        |  coalesce(g.n_docs, 0) AS n_docs,
        |  coalesce(g.total_size, 0) AS total_size
        |FROM generate_series(0, 15) s(i)
        |LEFT JOIN g ON s.i = g.shard""".stripMargin,

    "pack_assemble" ->
      s"""WITH p AS (
         |  SELECT doc_id, text, ${ntoks()} AS n_tokens,
         |    (doc_id % 16)::INT AS pack_bucket,
         |    floor((sum(${ntoks()}) OVER (PARTITION BY doc_id % 16
         |           ORDER BY doc_id) - ${ntoks()}) / 2048)::BIGINT AS pack_seq
         |  FROM documents)
         |SELECT pack_bucket, pack_seq, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  string_agg(text, ' ' ORDER BY doc_id) AS seq_text
         |FROM p GROUP BY 1, 2""".stripMargin,

    "pack_bpe_sequences" -> {
      // TextAnalysis.bpePattern with SQL-literal quote doubling (same
      // spelling the text_token_counts oracle already proves out)
      val bpe = "len(regexp_extract_all(text, " +
        "'''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+'))"
      s"""SELECT doc_id, $bpe AS n_tokens,
         |  (doc_id % 16)::INT AS pack_bucket,
         |  floor((sum($bpe) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id)
         |         - $bpe) / 2048)::BIGINT AS pack_seq
         |FROM documents""".stripMargin
    },

    "corpus_mix_weights" ->
      s"""WITH d AS (SELECT lang, count(*) AS n_docs,
         |    CAST(sum(${ntoks()}) AS BIGINT) AS domain_tokens
         |  FROM documents GROUP BY 1),
         |p AS (SELECT *, CAST(domain_tokens AS DOUBLE)
         |    / sum(domain_tokens) OVER () AS _p FROM d),
         |a AS (SELECT *, pow(_p, $mixAlpha) AS _pa FROM p)
         |SELECT lang, n_docs, domain_tokens, round(_p, 6) AS share,
         |  round(_pa / sum(_pa) OVER (), 6) AS mix_weight
         |FROM a""".stripMargin
  )
}
