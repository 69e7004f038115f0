package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, Sampling}
import graft.text.{CorpusQc, TextAnalysis}

/** Semantics of the round-4 corpus-QC family: repetition rules,
  * contamination scoring, PII scrub, deterministic sampling, sequence
  * packing. Cross-engine value parity is separately pinned by the DuckDB
  * oracles (text_repetition / text_contamination / text_pii_scrub /
  * sample_hash / pack_sequences).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- repetition
  test("repetition stats on a fully repetitive doc") {
    // "a a a a" (7 chars): 4 words, 1 distinct; 3 bigrams all "a a";
    // top masses: 4*1, 3*3, 2*5 chars
    val r = CorpusQc.repetitionStats(
      Seq((1L, "a a a a")).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(r.getAs[Int]("n_tokens") === 4)
    assert(r.getAs[Double]("dup_1gram_frac") === 0.75)
    assert(r.getAs[Double]("top_1gram_frac") === 0.571429)
    assert(r.getAs[Double]("dup_2gram_frac") === 0.666667)
    // overlapping occurrences: mass 3*3=9 over 7 chars exceeds 1
    assert(r.getAs[Double]("top_2gram_frac") === 1.285714)
    assert(r.getAs[Double]("dup_3gram_frac") === 0.5)
    assert(r.getAs[Double]("top_3gram_frac") === 1.428571)
  }

  test("repetition stats: no repeats, empty text, and sub-n docs") {
    val df = CorpusQc.repetitionStats(
      Seq((1L, "x y"), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val noRep = df(1L)
    assert(noRep.getAs[Double]("dup_1gram_frac") === 0.0)
    assert(noRep.getAs[Double]("top_1gram_frac") === 0.333333) // "x" of "x y"
    // 2 tokens: one bigram (distinct), zero trigrams -> all zero
    assert(noRep.getAs[Double]("dup_2gram_frac") === 0.0)
    assert(noRep.getAs[Double]("dup_3gram_frac") === 0.0)
    assert(noRep.getAs[Double]("top_3gram_frac") === 0.0)
    Seq(2L, 3L).foreach { id =>
      val r = df(id)
      assert(r.getAs[Int]("n_tokens") === 0)
      Seq("dup_1gram_frac", "top_1gram_frac", "dup_2gram_frac",
        "top_2gram_frac").foreach(c => assert(r.getAs[Double](c) === 0.0, c))
    }
  }

  test("top_gram_chars native expr matches the interpreted lambda form") {
    // the builtin equivalent: max over distinct grams of count * chars
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", split(trim($"text"), "\\s+").as("toks"))
    val grams = array_distinct(transform(
      sequence(lit(0), size($"toks") - 2),
      i => concat_ws(" ", slice($"toks", i + 1, lit(2)))))
    val lambda = coalesce(array_max(transform(grams, g =>
      size(filter(transform(
        sequence(lit(0), size($"toks") - 2),
        i => concat_ws(" ", slice($"toks", i + 1, lit(2)))), x => x === g))
        .cast("long") * length(g))), lit(0L))
    val mism = docs.select(
      graft.functions.TopGramCharsExpr.topGramChars($"toks", 2).as("native"),
      when(size($"toks") >= 2, lambda).otherwise(lit(0L)).as("builtin"))
      .filter($"native" =!= $"builtin").count()
    assert(mism === 0L)
  }

  test("top_gram_chars stays inside whole-stage codegen") {
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.functions.TopGramCharsExpr
        .topGramChars(split(trim($"text"), "\\s+"), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("top_gram_chars"), plan)
  }

  // ---------------------------------------------------- contamination
  test("contamination: identical, disjoint, and sub-n corpus docs") {
    val bench = Seq((100L, "q w e r t y u i o p")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "q w e r t y u i o p"),       // identical: all 3 8-grams hit
      (2L, "aa bb cc dd ee ff gg hh ii"), // disjoint: 0 of 2
      (3L, "too short")                   // < 8 tokens: 0 grams
    ).toDF("doc_id", "text")
    val got = CorpusQc.contaminationScores(corpus, bench, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_grams"), r.getAs[Long]("n_contaminated"),
          r.getAs[Double]("contamination_frac")))).toMap
    assert(got(1L) === ((3, 3L, 1.0)))
    assert(got(2L) === ((2, 0L, 0.0)))
    assert(got(3L) === ((0, 0L, 0.0)))
  }

  // -------------------------------------------------------- PII scrub
  test("pii scrub redacts emails, IPs and phones, in that order") {
    val out = Seq(
      "mail bob.smith@corp.io or 192.168.0.1 or +44 20 7946 0958 ok",
      "clean words only here").toDF("text")
      .select(CorpusQc.piiScrub($"text").as("s"))
      .as[String].collect()
    assert(out.contains("mail <EMAIL> or <IP> or <PHONE> ok"), out.toSeq)
    assert(out.contains("clean words only here"))
  }

  // ----------------------------------------------------- line filtering
  test("filterLines keeps >=minWords lines, collapses all-short docs") {
    val out = Seq(
      "one two three four\nshort line\nfive six seven eight nine",
      "a b\nc d",
      "",
      "   \nx y z w").toDF("text")
      .select(TextAnalysis.filterLines($"text", minWords = 4).as("f"))
      .as[String].collect().toSeq
    assert(out.contains(
      "one two three four\nfive six seven eight nine"))
    assert(out.contains("x y z w")) // blank line drops, 4-word line stays
    assert(out.count(_ == "") === 2) // all-short doc + empty doc
  }

  // -------------------------------------------------------------- tf-idf
  test("tfIdfTopK damps by document frequency and bounds k per doc") {
    val docs3 = Seq(
      (1L, "common rare"),
      (2L, "common common zz"),
      (3L, "common yy yy")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopK(docs3, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Int]("rank"))).toSet
    assert(out.count(_._1 == 1L) === 2)
    // doc 1, equal tf=1: rare df=1 -> 0.5 beats common df=3 -> 0.25 —
    // the df damping in isolation
    assert(out.contains((1L, "rare", 1)))
    assert(out.contains((1L, "common", 2)))
    // doc 2: common tf=2 df=3 -> 0.5 TIES zz tf=1 df=1 -> 0.5; the
    // ascending-term tiebreak must put 'common' first, deterministically
    assert(out.contains((2L, "common", 1)))
    assert(out.contains((2L, "zz", 2)))
  }

  // --------------------------------------------------------- sampling
  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("hash sample is deterministic, salted, and near its rate") {
    val a = Sampling.hashSample(docs, $"doc_id", "80")
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, $"doc_id", "80")
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b)                       // pure function of the data
    assert(a.size > 200 && a.size < 300,  // 0x80/0x100 = 50% of 500
      s"rate drifted: ${a.size}/500")
    // a lower threshold is a strict subset (same hash, tighter cut)
    val sub = Sampling.hashSample(docs, $"doc_id", "40")
      .select($"doc_id").as[Long].collect().toSet
    assert(sub.subsetOf(a))
    // a different salt draws an independent sample
    val salted = Sampling.hashSample(docs, $"doc_id", "80", salt = "v2")
      .select($"doc_id").as[Long].collect().toSet
    assert(salted !== a)
  }

  test("mixture resampling: deterministic copies, rates honored, caps loud") {
    val rates = Map("en" -> 0.5, "de" -> 2.25, "fr" -> 1.0, "es" -> 0.75)
    def run() = Sampling.resampleByRates(docs, $"doc_id", $"lang", rates)
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a === run()) // pure function of the data
    assert(!a.contains("zh"), "unlisted stratum must be dropped")
    val langN = docs.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum's emitted count within floor(r)..ceil(r) per row
    for ((lang, rate) <- rates) {
      val n = langN(lang)
      val lo = math.floor(rate).toLong * n
      val hi = math.ceil(rate).toLong * n
      assert(a(lang) >= lo && a(lang) <= hi,
        s"$lang: ${a(lang)} outside [$lo, $hi] for rate $rate over $n")
    }
    // upsampled stratum really repeats: epochs 1..3 present for de
    val epochs = Sampling.resampleByRates(docs, $"doc_id", $"lang", rates)
      .filter($"lang" === "de").select($"epoch").distinct()
      .as[Int].collect().sorted.toSeq
    assert(epochs === Seq(1, 2, 3))
    intercept[IllegalArgumentException] {
      Sampling.resampleByRates(docs, $"doc_id", $"lang", Map("en" -> 99.0))
    }
  }

  test("split assignment is exhaustive, disjoint, and near its weights") {
    val split = Sampling.assignSplit($"doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = docs.select($"doc_id", split.as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test")) // exhaustive
    assert(counts.values.sum === 500)
    assert(counts("train") > 350 && counts("train") < 450,
      s"train rate drifted: $counts")
    // same digest family: the train bucket IS hashSample at cccccccd
    val trainIds = docs.select($"doc_id", split.as("split"))
      .filter($"split" === "train").select($"doc_id").as[Long].collect().toSet
    val sampled = Sampling.hashSample(docs, $"doc_id", "cccccccd")
      .select($"doc_id").as[Long].collect().toSet
    assert(trainIds === sampled)
    // stable under repartitioning (pure function of the key)
    val re = docs.repartition(7).select($"doc_id", split.as("split"))
      .filter($"split" === "train").select($"doc_id").as[Long].collect().toSet
    assert(re === trainIds)
  }

  test("split assignment rejects bad weight vectors") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit($"doc_id", Seq("a" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit($"doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit($"doc_id", Seq("a" -> 0.5, "a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit($"doc_id", Seq("a" -> 1.1, "b" -> -0.1))
    }
  }

  test("stratified hash sample: unlisted strata drop, listed keep rate") {
    val strat = Sampling.stratifiedHashSample(
      docs, $"doc_id", $"lang", Map("en" -> "ff"))
    assert(strat.filter($"lang" =!= "en").count() === 0)
    val en = docs.filter($"lang" === "en").count()
    val kept = strat.count()
    assert(kept > 0 && kept <= en)
  }

  // ---------------------------------------------------------- packing
  test("sketch stats: HLL estimate within rsd bound, exact percentiles, " +
      "deterministic under repartitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val key = graft.text.TextAnalysis.fingerprint($"text")
    val got = CorpusQc.sketchStats(docs, "source", key, $"n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("approx_distinct"),
          r.getAs[scala.collection.Seq[Double]]("size_percentiles").toList)).toMap
    val exact = docs.groupBy($"source").agg(count_distinct(key).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (src, (n, approx, pcts)) =>
      val d = exact(src)
      // HLL++ at rsd=0.05: allow 4 sigma
      assert(math.abs(approx - d) <= math.max(2.0, 0.2 * d),
        s"$src: approx=$approx exact=$d")
      assert(n >= d)
      assert(pcts.size === 3 && pcts(0) <= pcts(1) && pcts(1) <= pcts(2))
    }
    // order/partitioning independence (max-merge HLL + exact percentile)
    val again = CorpusQc
      .sketchStats(docs.repartition(11), "source", key, $"n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("approx_distinct"),
          r.getAs[scala.collection.Seq[Double]]("size_percentiles").toList)).toMap
    assert(again === got)
  }

  test("shard assignment: exhaustive range, balanced, deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val counts = docs
      .groupBy(Packing.assignShard($"doc_id", 16).as("shard")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet.forall(s => s >= 0 && s < 16))
    // 16 shards over the sf0.001 corpus: all populated, none pathological
    assert(counts.size === 16)
    assert(counts.values.max < 4 * counts.values.min)
    // pure function of the key: repartitioning changes nothing
    val again = docs.repartition(7)
      .groupBy(Packing.assignShard($"doc_id", 16).as("shard")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again === counts)
    // manifest totals reconcile with the corpus, and the manifest is
    // DENSE: one row per shard id even when a shard is empty
    val m = Packing.shardManifest(docs, $"doc_id", length($"text"), 16)
    assert(m.agg(sum($"n_docs")).head().getLong(0) === docs.count())
    val sparse = Packing.shardManifest(docs.limit(3), $"doc_id",
      length($"text"), 4096)
    assert(sparse.count() === 4096L)
    assert(sparse.filter($"n_docs" === 0).count() >= 4093L)
    intercept[IllegalArgumentException] {
      Packing.assignShard($"doc_id", 0)
    }
    // the writer round-trips: one directory per populated shard, and
    // the read-back corpus (with its shard labels) is exactly the input
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    try {
      Packing.writeShards(docs, $"doc_id", 8, out)
      val back = spark.read.parquet(out)
      assert(back.count() === docs.count())
      assert(back.select($"shard").distinct().count() === 8L)
      val mismatch = back
        .withColumn("expect", Packing.assignShard($"doc_id", 8))
        .filter($"shard" =!= $"expect").count()
      assert(mismatch === 0L)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(out))
    }
  }

  test("pack chunks: budget boundaries and straddling docs") {
    val df = Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 9L), (4L, 3L))
      .toDF("doc_id", "n_tokens")
    // one bucket, budget 10: starts 0,4,8,12,21 -> seqs 0,0,0,1,2
    val got = Packing.packChunks(df, "doc_id", "n_tokens", 10L, 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_seq"))
      .toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("pack chunks: buckets are independent id-ordered streams") {
    val df = (0L until 8L).map(i => (i, 6L)).toDF("doc_id", "n_tokens")
    val got = Packing.packChunks(df, "doc_id", "n_tokens", 10L, 2)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("pack_bucket"), r.getAs[Long]("pack_seq"))).toSet
    // evens in bucket 0 at starts 0,6,12,18; odds in bucket 1 likewise
    assert(got === Set(
      (0L, 0, 0L), (2L, 0, 0L), (4L, 0, 1L), (6L, 0, 1L),
      (1L, 1, 0L), (3L, 1, 0L), (5L, 1, 1L), (7L, 1, 1L)))
  }

  // --------------------------------------------------------- chunking
  test("chunkByTokens: window/stride layout, short tail, empty docs") {
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "only three tokens"),
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = graft.text.Chunker
      .chunkByTokens(df, "doc_id", "text", width = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Int]("n_chunk_tokens"), r.getAs[String]("chunk_text")))
      .toSet
    // doc 1: starts 0,3,6,9 -> three full windows + a 1-token tail
    assert(got === Set(
      (1L, 0, 4, "t0 t1 t2 t3"), (1L, 1, 4, "t3 t4 t5 t6"),
      (1L, 2, 4, "t6 t7 t8 t9"), (1L, 3, 1, "t9"),
      (2L, 0, 3, "only three tokens")))
  }

  test("chunkByTokens covers every token with the exact window layout") {
    val chunks = graft.text.Chunker.chunkByTokens(
      docs, "doc_id", "text", width = 64, stride = 48)
    val per = chunks.groupBy($"doc_id")
      .agg(sum($"n_chunk_tokens").as("sum_chunk"),
        count(lit(1)).as("n_chunks"),
        max($"chunk_id").as("max_id"))
    val n = graft.text.TextAnalysis.tokenCount($"text")
    // exact layout per doc: one chunk per start in {0,48,...} < n, each
    // min(64, n - start) tokens — covers every token, dense chunk ids
    val expected = docs.select($"doc_id", n.as("n_tokens"),
      ceil(n.cast("double") / 48).cast("long").as("exp_chunks"),
      aggregate(sequence(lit(0), n - 1, lit(48)), lit(0L),
        (acc, s) => acc + least(lit(64), n - s)).as("exp_sum"))
      .filter($"n_tokens" > 0)
    val joined = per.join(expected, "doc_id")
    assert(joined.count() === docs.filter(n > 0).count())
    val bad = joined.filter(
      $"sum_chunk" =!= $"exp_sum" || $"n_chunks" =!= $"exp_chunks" ||
        $"max_id" =!= $"n_chunks" - 1).count()
    assert(bad === 0L)
  }

  test("chunking plan is map-only: no exchange, one generate") {
    val plan = graft.text.Chunker.chunkByTokens(
      docs, "doc_id", "text", 64, 48)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Generate"), plan)
  }

  // ------------------------------------------------------------- bm25
  test("bm25: rare term outranks common ones; non-matching docs absent") {
    val df = Seq(
      (1L, "rare word alpha beta gamma"),
      (2L, "common common common word beta"),
      (3L, "common word beta gamma delta"),
      (4L, "nothing matches here at all"))
      .toDF("doc_id", "text")
    val got = graft.text.Ranking
      .bm25TopK(df, "doc_id", "text", Seq("rare", "common"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L))
    // doc 1 holds the corpus's only "rare" -> highest idf mass wins
    assert(got.head._1 === 1L)
    // doc 2 has 3x "common" vs doc 3's 1x, same length -> ranks above
    val byId = got.toMap
    assert(byId(2L) > byId(3L))
    // ordering is by rounded score desc
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
  }

  test("bm25 top-k cut is deterministic and k-bounded on the corpus") {
    val a = graft.text.Ranking.bm25TopK(
      docs, "doc_id", "text", Seq("dup", "spark", "merge"), k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = graft.text.Ranking.bm25TopK(
      docs, "doc_id", "text", Seq("dup", "spark", "merge"), k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
    assert(a.size === 50)
    assert(a.forall(_._2 > 0.0))
  }

  // -------------------------------------------------- mixture weights
  test("curate: end-to-end composition gates, splits and packs") {
    import org.apache.spark.sql.functions.pmod
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(pmod($"doc_id", lit(50)) =!= 0)
    val bench = docs.filter(pmod($"doc_id", lit(50)) === 0)
    val cfg = graft.operators.Curate.CurateConfig(
      contaminationN = 3, maxContaminationFrac = 0.06)
    val out = graft.operators.Curate.curate(corpus, bench, "doc_id", "text",
      cfg)
    val rows = out.collect()
    val nCorpus = corpus.count()
    assert(rows.nonEmpty, "curation must keep documents")
    assert(rows.length < nCorpus, "curation must drop documents")
    // the dedup stages bite beyond the map-only QC gates alone
    val qcOnly = corpus.filter(
      graft.text.TextAnalysis.tokenCount($"text") >= 20 &&
        graft.text.TextAnalysis.punctRatio($"text") < 0.1 &&
        graft.text.TextAnalysis.stopwordRatio($"text") > 0.0 &&
        graft.text.CorpusQc.dupGramFrac($"text", 3) <= 0.5 &&
        graft.text.CorpusQc.topGramFrac($"text", 2) <= 0.2).count()
    assert(qcOnly < nCorpus, "QC gates must be non-vacuous")
    assert(rows.length < qcOnly, "dedup stages must drop beyond QC")
    // field contracts
    assert(rows.forall(_.getAs[Int]("n_tokens") >= 20))
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits("train"))
    assert(rows.forall(_.getAs[Long]("pack_seq") >= 0))
    // packing never mixes splits inside a (split, bucket) stream: seqs
    // count from 0 within every split
    val bySplit = rows.groupBy(_.getAs[String]("split"))
    bySplit.foreach { case (s, rs) =>
      assert(rs.map(_.getAs[Long]("pack_seq")).min === 0L, s"split $s")
    }
    // deterministic end to end
    val again = graft.operators.Curate
      .curate(corpus, bench, "doc_id", "text", cfg).collect()
    assert(rows.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }

  test("mixture weights: shares and weights sum to 1; alpha flattens") {
    val df = Seq.fill(90)(("en", 100L)) ++ Seq.fill(9)(("de", 100L)) ++
      Seq.fill(1)(("fr", 100L))
    val input = df.toDF("lang", "n_tokens")
    val w3 = CorpusQc.mixtureWeights(input, "lang", "n_tokens", 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("share"),
          r.getAs[Double]("mix_weight")))).toMap
    assert(w3("en")._1 === 90L)
    assert(math.abs(w3.values.map(_._2).sum - 1.0) < 1e-5)
    assert(math.abs(w3.values.map(_._3).sum - 1.0) < 1e-5)
    // alpha < 1 upsamples the tail: fr's weight exceeds its share
    assert(w3("fr")._3 > w3("fr")._2)
    assert(w3("en")._3 < w3("en")._2)
    // alpha = 1 is proportional sampling: weight == share
    val w1 = CorpusQc.mixtureWeights(input, "lang", "n_tokens", 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("share"), r.getAs[Double]("mix_weight")))).toMap
    w1.values.foreach { case (share, weight) =>
      assert(math.abs(share - weight) < 2e-6)
    }
  }
}
