package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.{CorpusQc, NgramLm}

/** Semantics of the round-7 curation family: bigram-LM perplexity
  * filtering, cross-document repeated-span detection/removal, SemDeDup,
  * and the data card. Cross-engine value parity is separately pinned by
  * the DuckDB oracles (text_perplexity / dedup_span_stats /
  * dedup_span_removal / corpus_data_card); sim_semdedup is digest-pinned
  * in GoldenDigestsSpec.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ perplexity LM
  private val lmRef = Seq((0L, "a b a b"), (10L, "a c"))
    .toDF("doc_id", "text")

  test("bigram LM scores match hand-computed add-one smoothing") {
    // ref counts: c2(a,b)=2 c2(b,a)=1 c2(a,c)=1; c1(a)=3 c1(b)=1; V=3
    val tgt = Seq((1L, "a b z"), (2L, "q q"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val out = NgramLm.perplexity(lmRef, tgt, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trans"), r.getAs[Double]("avg_nll"))).toMap
    // P(b|a)=(2+1)/(3+3)=.5 -> 1 bit; P(z|b)=(0+1)/(1+3)=.25 -> 2 bits
    assert(out(1L) === ((2L, 1.5)))
    // unseen context q: P=(0+1)/(0+3) -> log2(3)
    assert(out(2L) === ((1L, 1.584963)))
    // <2 tokens: no transition, no score
    assert(!out.contains(3L) && !out.contains(4L))
  }

  test("perplexity filter keeps the low-bits head") {
    val tgt = Seq((1L, "a b z"), (2L, "q q")).toDF("doc_id", "text")
    val kept = NgramLm.perplexityFilter(lmRef, tgt, "doc_id", "text",
      maxBits = 1.55).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("perplexity is deterministic under repartitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = docs.filter(pmod($"doc_id", lit(10)) === 0)
    val tgt = docs.filter(pmod($"doc_id", lit(10)) =!= 0)
    val a = NgramLm.perplexity(ref, tgt, "doc_id", "text")
    val b = NgramLm.perplexity(ref.repartition(7), tgt.repartition(13),
      "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
  }

  test("perplexity buckets cut head/middle/tail at score quantiles") {
    // three distinct micro-bit scores -> exactly one doc per bucket
    // (interpolated thirds land strictly between adjacent values):
    // d1 "a b" -> 1 bit; d2 "a b z" -> 1.5 bits; d3 "q q" -> log2(3)
    val tgt = Seq((1L, "a b"), (2L, "a b z"), (3L, "q q"))
      .toDF("doc_id", "text")
    val out = NgramLm.perplexityBuckets(
        NgramLm.perplexity(lmRef, tgt, "doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("nll_micro"), r.getAs[String]("ppl_bucket"))).toMap
    assert(out(1L) === ((1000000L, "head")))
    assert(out(2L) === ((1500000L, "middle")))
    assert(out(3L) === ((1584963L, "tail")))
  }

  test("quantile buckets stay populated under vocab growth where a " +
      "fixed threshold empties (the 100x probe's failure shape)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def stats(all: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val ref = all.filter(pmod($"doc_id", lit(10)) === 0)
      val tgt = all.filter(pmod($"doc_id", lit(10)) =!= 0)
      val scored = NgramLm.perplexity(ref, tgt, "doc_id", "text")
      val b = NgramLm.perplexityBuckets(scored)
        .groupBy($"ppl_bucket").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = b.values.sum.toDouble
      val med = scored.agg(expr("percentile(avg_nll, 0.5d)"))
        .head().getDouble(0)
      (b.getOrElse("head", 0L) / n, med)
    }
    val (f1, medBase) = stats(docs)
    // vocab-growth shape, exactly like the crawl fan-out probe: every
    // doc (REFERENCE slice included — that's what grows V) gets a
    // unique lead token; add-one smoothing spreads unseen mass thinner,
    // shifting the score distribution upward
    val fanned = docs.withColumn("text",
      concat(lit("u"), $"doc_id", lit(" "), $"text"))
    val (f2, medFan) = stats(fanned)
    // the quantile gate keeps its fraction in BOTH regimes...
    assert(f1 > 0.25 && f1 < 0.45 && f2 > 0.25 && f2 < 0.45)
    // ...while the score distribution a fixed-bits gate cuts against
    // has moved under it
    assert(medFan > medBase)
  }

  test("curate's quantile perplexity gate: monotone in q, subset of " +
      "the ungated run") {
    import graft.operators.Curate
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(pmod($"doc_id", lit(50)) === 0)
    val corpus = docs.filter(pmod($"doc_id", lit(50)) =!= 0)
    val cfg = Curate.CurateConfig(contaminationN = 3,
      maxContaminationFrac = 0.06)
    // the gate itself is monotone in q; the COMPOSITION's final ids are
    // not (a gated-out doc can be an LSH cluster keeper, shifting
    // keeper choice downstream) — so pin the wiring: every survivor of
    // the quantile-gated run scored in the head bucket of the same LM
    val q = 0.6
    val classified = corpus.filter(Curate.qcPredicate($"text", cfg))
    val headIds = NgramLm.perplexityBuckets(
        NgramLm.perplexity(bench,
          classified.select($"doc_id", $"text"), "doc_id", "text"), q, q)
      .filter($"ppl_bucket" === "head")
      .select($"doc_id").as[Long].collect().toSet
    assert(headIds.nonEmpty)
    val gated = Curate.curate(corpus, bench, "doc_id", "text",
        cfg.copy(perplexityQuantile = Some(q)), lmRef = Some(bench))
      .select($"doc_id").as[Long].collect().toSet
    Curate.clearManifests()
    assert(gated.nonEmpty)
    assert(gated.subsetOf(headIds))
    // and the gate actually prunes: some classic-run survivor is gone
    val ungated = Curate.curate(corpus, bench, "doc_id", "text", cfg)
      .select($"doc_id").as[Long].collect().toSet
    Curate.clearManifests()
    assert((ungated -- headIds).nonEmpty)
  }

  test("curateIncrement: history dups never reach the composition") {
    import graft.operators.Curate
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
    val batch = docs.filter(pmod($"doc_id", lit(3)) === 0)
    val bench = docs.filter(pmod($"doc_id", lit(50)) === 0)
    val cfg = Curate.CurateConfig(contaminationN = 3,
      maxContaminationFrac = 0.06)
    val idx = Dedup.dedupIndex(hist, "doc_id", "text",
      cfg.minhashK, cfg.bands)
    val out = Curate.curateIncrement(batch, bench, idx, "doc_id", "text",
        cfg)
      .select($"doc_id").as[Long].collect().toSet
    Curate.clearManifests()
    assert(out.nonEmpty)
    val histDups = Dedup.incrementalStatus(batch, idx, "doc_id", "text",
        cfg.minhashK, cfg.bands)
      .filter($"status" =!= "kept")
      .select($"doc_id").as[Long].collect().toSet
    assert(histDups.nonEmpty)
    assert((out & histDups).isEmpty)
  }

  // --------------------------------------------------- repeated spans
  private val spanDocs = Seq(
    (1L, "a b c d e"),     // first occurrence of every gram it has
    (2L, "x A B C y"),     // shares "a b c" (case-folded span identity)
    (3L, "p q"),           // shorter than n
    (4L, ""),              // empty
    (5L, "a b c d e")      // exact dup of doc 1: every span foreign
  ).toDF("doc_id", "text")

  test("repeatedSpanStats counts cross-doc duplicated spans") {
    val out = Dedup.repeatedSpanStats(spanDocs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_frac"))).toMap
    assert(out(1L) === ((3L, 3L, 1.0))) // all three spans also in doc 5
    assert(out(2L) === ((3L, 1L, 0.333333)))
    assert(out(3L) === ((0L, 0L, 0.0)))
    assert(out(4L) === ((0L, 0L, 0.0)))
    assert(out(5L) === ((3L, 3L, 1.0)))
  }

  test("removeRepeatedSpans strips later occurrences, keeps the first") {
    val out = Dedup.removeRepeatedSpans(spanDocs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    // doc 1 is first-seen for every duplicated span -> untouched
    assert(out(1L) === ((5, 0L, "a b c d e")))
    // doc 2: span "a b c" first seen in doc 1 -> tokens 2..4 removed
    assert(out(2L) === ((5, 3L, "x y")))
    assert(out(3L) === ((2, 0L, "p q")))
    assert(out(4L) === ((0, 0L, "")))
    // doc 5: overlapping foreign spans at starts 1,2,3 cover all 5 tokens
    assert(out(5L) === ((5, 5L, "")))
  }

  test("span ops are deterministic under repartitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Dedup.removeRepeatedSpans(docs, "doc_id", "text")
    val b = Dedup.removeRepeatedSpans(docs.repartition(11), "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // non-vacuous on the harness corpus: something actually gets removed
    assert(a.agg(sum($"n_removed")).head().getLong(0) > 0)
  }

  // ----------------------------------------------------------- semdedup
  test("semDedup groups transitively within a cluster and keeps min id") {
    def unit(deg: Double) = Seq(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    // chain: cos(4deg)=.99756 >= .995, cos(8deg)=.99027 < .995 — a and c
    // join only through b; d is its own group
    val vecs = Seq(
      (1L, unit(0)), (2L, unit(4)), (3L, unit(8)), (4L, unit(90)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
      .toDF("cent_id", "cent_vec")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", cents,
        threshold = 0.995)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("group"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) === ((1L, true)))
    assert(out(2L) === ((1L, false)))
    assert(out(3L) === ((1L, false)))
    assert(out(4L) === ((4L, true)))
  }

  test("semDedup keeps exactly one representative per group") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = emb.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("cent_vec"))
    val out = Similarity.semDedup(emb, "vec_id", "embedding", cents, 0.99)
    val perGroup = out.groupBy($"group")
      .agg(sum(when($"keep", 1).otherwise(0)).as("n_keep"))
    assert(perGroup.filter($"n_keep" =!= 1).count() === 0)
    assert(out.count() === emb.count()) // total: every vector classified
  }

  test("semDedupTrained tolerates empty input and stride-dodging ids") {
    // empty survivor set (an increment that was ALL history dups):
    // empty output with the semDedup schema, no 'empty centroid' crash
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val out0 = Similarity.semDedupTrained(empty, "vec_id", 0.9)
    assert(out0.columns.toSeq ===
      Seq("vec_id", "cent_id", "group", "keep"))
    assert(out0.count() === 0)
    // ids {1,3,5,7}: n=4 -> stride=2, no id divisible by 2 — the
    // min-id fallback seed must kick in instead of crashing
    def unit(deg: Double) = Seq(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val sparse = Seq((1L, unit(0)), (3L, unit(2)), (5L, unit(45)),
      (7L, unit(90))).toDF("vec_id", "embedding")
    val out = Similarity.semDedupTrained(sparse, "vec_id", 0.995)
    assert(out.count() === 4)
    assert(out.filter($"keep").count() >= 1)
  }

  // --------------------------------------------------- quality classifier
  test("hashed-BoW logistic learns a separable vocabulary") {
    import graft.text.QualityClassifier
    val good = Seq("clear prose with structure", "well formed sentence here",
      "clear sentence with meaning", "prose with good structure")
    val bad = Seq("zzz click buy now spam", "buy spam click zzz now",
      "spam zzz buy click now", "click now buy spam zzz")
    val train = (good.zipWithIndex.map { case (t, i) => (i.toLong, t, 1) } ++
      bad.zipWithIndex.map { case (t, i) => (100L + i, t, 0) })
      .toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(train, "doc_id", "text", "label",
      dim = 512, iters = 60, lr = 1.0)
    val test = Seq((1000L, "clear prose sentence"), (1001L, "buy zzz spam"))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(test, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(out(1000L) === true)
    assert(out(1001L) === false)
  }

  test("classifier training is deterministic under repartitioning") {
    import graft.text.QualityClassifier
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("label",
        (graft.text.TextAnalysis.qualityScore($"text") >= 0.8).cast("int"))
    val m1 = QualityClassifier.train(docs, "doc_id", "text", "label")
    val m2 = QualityClassifier.train(docs.repartition(17), "doc_id",
      "text", "label")
    assert(m1.bias === m2.bias)
    assert(m1.weights.toSeq === m2.weights.toSeq)
  }

  // ------------------------------------------------------ full curate
  test("full-config curate composes the statistical stages coherently") {
    val sf = "/root/testdata/sf0.01"
    val full = SparkEntry.queries("corpus_curate_full")(spark, sf)
      .select($"doc_id", $"n_tokens").collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n_tokens")).toMap
    val classic = SparkEntry.queries("corpus_curate_e2e")(spark, sf)
      .select($"doc_id", $"n_tokens").collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n_tokens")).toMap
    assert(full.nonEmpty)
    // span dedup only ever REMOVES tokens: any doc surviving both
    // configs packs at most its classic token count (keeper sets may
    // legitimately differ — gating a cluster's min-id keeper promotes
    // another member)
    val shared = full.keySet.intersect(classic.keySet)
    assert(shared.nonEmpty)
    shared.foreach { id => assert(full(id) <= classic(id)) }
  }

  test("Bloom-form increment keeps a subset of the exact increment") {
    val sf = "/root/testdata/sf0.01"
    val bloom = SparkEntry.queries("corpus_curate_increment_bloom")(spark, sf)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("corpus_curate_increment")(spark, sf)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // one-sided error: a Bloom fp can only DROP a novel doc (classified
    // as a presumed history dup), never admit one — so the Bloom
    // variant's survivors are always contained in the exact path's
    assert(bloom.nonEmpty)
    assert(bloom.subsetOf(exact))
  }

  test("lines+terms curate: line rewrite feeds every gate, salient " +
      "terms ride the manifest non-vacuously") {
    val sf = "/root/testdata/sf0.01"
    val variant = SparkEntry.queries("corpus_curate_lines_terms")(spark, sf)
      .collect()
    assert(variant.nonEmpty)
    // every kept doc carries exactly k=3 salient terms (the flattened
    // (rank, term) rows), ranks 0..2, terms non-null
    val byDoc = variant.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rows) =>
      assert(rows.length === 3, s"doc $id: ${rows.length} term rows")
      assert(rows.map(_.getAs[Int]("term_rank")).sorted.toSeq === Seq(0, 1, 2))
      rows.foreach(r => assert(r.getAs[String]("term") != null))
    }
    // the line filter only ever REMOVES tokens: shared survivors pack
    // at most their classic token count, and the rewrite is genuinely
    // non-vacuous (some shared doc shrank)
    val classic = SparkEntry.queries("corpus_curate_e2e")(spark, sf)
      .select($"doc_id", $"n_tokens").collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n_tokens")).toMap
    val vTok = variant.map(r =>
      r.getLong(0) -> r.getAs[Int]("n_tokens")).toMap
    val shared = vTok.keySet.intersect(classic.keySet)
    assert(shared.nonEmpty)
    shared.foreach { id => assert(vTok(id) <= classic(id)) }
    assert(shared.exists(id => vTok(id) < classic(id)),
      "line filter removed no tokens anywhere — vacuous fixture")
  }

  test("semantic curate keeps a strict subset of the classic doc set") {
    val sf = "/root/testdata/sf0.01"
    val sem = SparkEntry.queries("corpus_curate_semantic")(spark, sf)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val classic = SparkEntry.queries("corpus_curate_e2e")(spark, sf)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // the semantic stage only ever REMOVES docs from the LSH survivors
    // (keeper = component min id, already a survivor), so unlike the
    // span/gate configs the doc set is a true subset — and at the
    // pinned 0.9 threshold a PROPER one (the stage is non-vacuous)
    assert(sem.nonEmpty)
    assert(sem.subsetOf(classic))
    assert(sem.size < classic.size)
  }

  // ---------------------------------------------------------- data card
  test("data card aggregates per language") {
    val docs = Seq(
      (1L, "en", "s1", "one"), (2L, "en", "s2", "one two"),
      (3L, "en", "s1", "one two three"), (4L, "de", "s3", "ein zwei"),
      (5L, "de", "s3", "")).toDF("doc_id", "lang", "source", "text")
    val out = CorpusQc.dataCard(docs, "lang", "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_docs") === 3)
    assert(en.getAs[Long]("n_sources") === 2)
    assert(en.getAs[Long]("total_tokens") === 6)
    assert(en.getAs[Long]("total_chars") === (3 + 7 + 13))
    assert(en.getAs[Double]("avg_tokens") === 2.0)
    assert(en.getAs[Double]("median_tokens") === 2.0)
    val de = out("de")
    assert(de.getAs[Long]("n_docs") === 2)
    assert(de.getAs[Double]("median_tokens") === 1.0) // interpolated 0,2
  }
}
