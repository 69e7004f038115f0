package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Deduplication extension queries over `documents`, running the real
  * graft.dedup operators. dedup_simhash_pairs has no SQL oracle (JVM
  * bit-fold hash) — spec-tested in DedupSpec instead.
  */
object DedupQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_exact_groups" -> ((s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")),

    "dedup_exact_keep" -> ((s, d) => {
      import s.implicits._
      Dedup.exactDedup(Tables.documents(s, d), "doc_id", "text")
        .select($"doc_id", $"source")
    }),

    "dedup_tokenset_groups" -> ((s, d) =>
      Dedup.tokenSetGroups(Tables.documents(s, d), "doc_id", "text")),

    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
        k = 16, bands = 4)),

    "dedup_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 5, thresholdNum = 8, thresholdDen = 10)),

    "dedup_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxDist = 8)),

    // C4/RefinedWeb-style paragraph-granular exact dedup: first global
    // occurrence of each normalized paragraph survives, docs reassemble
    // from survivors (full oracle: window + ordered string_agg)
    "dedup_paragraphs" -> ((s, d) =>
      Dedup.paragraphDedup(Tables.documents(s, d), "doc_id", "text")),

    // incremental-crawl dedup: history slice (2/3 of the corpus) is
    // reduced to its compact fp/band index; the new batch — the other
    // 1/3 plus a RE-CRAWL of some unchanged history pages under fresh
    // crawl ids (+100000, the realistic increment shape; the corpus has
    // no native exact dups) — is classified against it. 2x8 banding
    // (curate's precision-leaning setting) keeps a `kept` population;
    // md5-keyed identities make the WHOLE path oracle-checkable.
    // sf0.01: 34 exact_hist / 138 near_hist / 29 kept — non-vacuous.
    "dedup_incremental" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      val batch = docs.filter(pmod($"doc_id", lit(3)) === 0)
        .select($"doc_id", $"text")
        .unionByName(hist
          .filter(pmod($"doc_id", lit(10)) === 1)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
      Dedup.incrementalStatus(batch,
          Dedup.dedupIndex(hist, "doc_id", "text", k = 16, bands = 2),
          "doc_id", "text", k = 16, bands = 2)
        .select($"doc_id", $"status")
    }),

    // the SEMANTIC form of the increment classification — the third leg
    // of the crawl-loop trilogy (exact keys, Bloom bits, embedding
    // nearness): each new doc ADC-retrieves its nearest history
    // candidates from the memoized 8 B/vector PQ code table, the top
    // one re-ranks exactly, and best cosine >= 0.995 (the measured
    // SemDeDup operating point) marks it sem_hist. Re-crawled pages
    // embed identically (sim 1.0) and must all be caught; token-order
    // rewrites land here too, where the fp/band indexes need the exact
    // banding collision. No SQL oracle (codebooks/ADC) — digest-pinned;
    // catch-the-recrawl + kept-consistency contracts in ExtensionsSpec.
    "dedup_incremental_semantic" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      val batch = docs.filter(pmod($"doc_id", lit(3)) === 0)
        .select($"doc_id", $"text")
        .unionByName(hist
          .filter(pmod($"doc_id", lit(10)) === 1)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
      graft.dedup.Dedup.semanticStatus(batch,
          Fixtures.histSemanticIdx(s, d), "doc_id", "text")
        .select($"doc_id", $"status", $"match_id", $"best_sim")
    }),

    // the Bloom form of the same classification: index folded into two
    // broadcast filters, classify map-only (no join, no shuffle). No
    // SQL oracle (filter bits aren't SQL-expressible) — digest-pinned,
    // one-sided-error contract vs the exact path in ExtensionsSpec
    "dedup_incremental_bloom" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      val batch = docs.filter(pmod($"doc_id", lit(3)) === 0)
        .select($"doc_id", $"text")
        .unionByName(hist
          .filter(pmod($"doc_id", lit(10)) === 1)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
      // max(fixed, count): 20000 covers sf<=0.1 (filter geometry — and
      // so the pinned digest — unchanged there) while a larger SF sizes
      // to its real history instead of tripping build's saturation guard
      val idx = graft.dedup.BloomIndex.build(hist, "text",
        expectedItems = math.max(20000L, hist.count()),
        fpp = 0.001, k = 16, bands = 2)
      graft.dedup.BloomIndex.classify(batch, idx, "text")
        .select($"doc_id", $"status")
    }),

    // the between-increments EVOLUTION loop the 100 TB crawl story
    // needs: classify increment 1 against the history index, FOLD
    // inc1's kept docs into the same filters (BloomIndex.fold — one
    // treeAggregate putString-ing into copies of the existing bits,
    // saturation-guarded), then classify increment 2, which re-crawls
    // some inc1-kept pages under fresh ids (+200000): those must now
    // read exact_hist off the GROWN index, not leak as kept. No SQL
    // oracle (filter bits) — digest-pinned; fold/saturation contracts
    // are asserted in ExtensionsSpec.
    "dedup_incremental_bloom_fold" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      val inc1 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 0)
        .select($"doc_id", $"text")
      val inc2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 1)
        .select($"doc_id", $"text")
        .unionByName(inc1.filter(pmod($"doc_id", lit(4)) === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
      // budget sized to the whole loop (history + both increments) —
      // the contract fold's saturation guard enforces
      val idx0 = graft.dedup.BloomIndex.build(hist, "text",
        expectedItems = docs.count(), fpp = 0.001, k = 16, bands = 2)
      val c1 = graft.dedup.BloomIndex.classify(inc1, idx0, "text")
      val kept1 = c1.filter($"status" === "kept").select($"doc_id", $"text")
      val idx1 = graft.dedup.BloomIndex.fold(idx0, kept1, "text")
      val c2 = graft.dedup.BloomIndex.classify(inc2, idx1, "text")
      c1.select($"doc_id", lit(1).as("increment"), $"status")
        .unionByName(
          c2.select($"doc_id", lit(2).as("increment"), $"status"))
    }),

    // the semantic EVOLUTION loop (bloom_fold's analog for the third
    // leg): classify increment 1 against the memoized index, append
    // inc1's kept docs (encoded with the EXISTING quantizers — map-only,
    // the caller's index untouched), classify increment 2, which
    // re-crawls some inc1-kept pages under fresh ids (+200000): those
    // must read sem_hist at 1.0 off the GROWN index, not leak as kept.
    // Digest-pinned; append/catch contracts in ExtensionsSpec.
    "dedup_incremental_semantic_fold" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val inc1 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 0)
        .select($"doc_id", $"text")
      val inc2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 1)
        .select($"doc_id", $"text")
        .unionByName(inc1.filter(pmod($"doc_id", lit(4)) === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
      val idx0 = Fixtures.histSemanticIdx(s, d)
      val c1 = graft.dedup.Dedup.semanticStatus(inc1, idx0,
        "doc_id", "text")
      val kept1 = c1.filter($"status" === "kept").select($"doc_id", $"text")
      val idx1 = graft.dedup.Dedup.semanticAppend(idx0, kept1,
        "doc_id", "text")
      val c2 = graft.dedup.Dedup.semanticStatus(inc2, idx1,
        "doc_id", "text")
      c1.select($"doc_id", lit(1).as("increment"), $"status")
        .unionByName(
          c2.select($"doc_id", lit(2).as("increment"), $"status"))
    }),

    // the STORED form of the semantic evolution loop — the deployment
    // cycle as it actually runs between crawls (r13): the history index
    // persisted via SemanticIndexIO.save, increment 1 classified
    // against the STORE with the probe-side partition prune
    // (semanticStatusStored reads only the probed cent_bucket files —
    // PlanSpec pins the pruned scan), inc1's kept docs appended as an
    // append-only fragment (appendSave — I/O proportional to the
    // increment, not the history), increment 2 classified against the
    // grown store and its re-crawls of inc1 pages must read sem_hist
    // off it. Statuses bit-equal the in-memory fold loop's by the
    // storage round-trip parity pins (ExtensionsSpec). No SQL oracle
    // (codebooks/ADC) — digest-pinned.
    "dedup_semantic_stored" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val inc1 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 0)
        .select($"doc_id", $"text")
      val inc2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 1)
        .select($"doc_id", $"text")
        .unionByName(inc1.filter(pmod($"doc_id", lit(4)) === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_sem_stored")
      // explicit file:// URI: SemanticIndexIO resolves scheme-less paths
      // against the Hadoop DEFAULT fs, which on a real deployment is not
      // the local fs this temp dir (and its finally-delete) lives on
      val dir = tmp.toUri.toString
      try {
        graft.dedup.SemanticIndexIO.save(Fixtures.histSemanticIdx(s, d), dir)
        // c1 is consumed AFTER appendSave replaces the generation its
        // lazy plan reads (the old quantizer tree is swept post-flip) —
        // localize it first; bounded by the increment
        val c1Lazy = graft.dedup.Dedup.semanticStatusStored(s, dir, inc1,
          "doc_id", "text")
        val c1 = s.createDataFrame(
          java.util.Arrays.asList(c1Lazy.collect(): _*), c1Lazy.schema)
        val kept1 = c1.filter($"status" === "kept")
          .select($"doc_id", $"text")
        graft.dedup.SemanticIndexIO.appendSave(s, dir,
          graft.dedup.Dedup.semanticEncode(
            graft.dedup.SemanticIndexIO.load(s, dir), kept1,
            "doc_id", "text"))
        val c2 = graft.dedup.Dedup.semanticStatusStored(s, dir, inc2,
          "doc_id", "text")
        val out = c1.select($"doc_id", lit(1).as("increment"), $"status")
          .unionByName(
            c2.select($"doc_id", lit(2).as("increment"), $"status"))
        // bounded result copied out so the temp store can be deleted
        // before returning (a lazy frame would pin the files)
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally Tables.deleteTree(tmp)
    }),

    // the STORED form of the EXACT-KEYS evolution loop — the first
    // leg's deployment cycle (bloom_fold / semantic_stored's analog,
    // and the only one of the three with a full SQL oracle: md5 keys
    // end to end): history index persisted via DedupIndexIO.save
    // (parquet partitioned by kind, so each classify semi-join prunes
    // to its own partition), increment 1 classified against the STORE,
    // inc1's kept docs' keys appended (I/O proportional to the
    // increment — history partitions never re-read or rewritten), and
    // increment 2 — which re-crawls some inc1 pages under fresh ids
    // (+200000) — must read its inc1-kept re-crawls as exact_hist off
    // the GROWN store, not leak them as kept. Parity with the
    // in-memory Dedup.indexFold loop is pinned in ExtensionsSpec.
    "dedup_incremental_stored" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      val inc1 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 0)
        .select($"doc_id", $"text")
      val inc2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 1)
        .select($"doc_id", $"text")
        .unionByName(inc1.filter(pmod($"doc_id", lit(4)) === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_key_stored")
      // save refuses an existing path (destructive-overwrite guard), so
      // the store lives one level below the temp root; explicit file://
      // URI for the same default-fs reason as dedup_semantic_stored
      val dir = tmp.resolve("idx").toUri.toString
      try {
        graft.dedup.DedupIndexIO.save(
          Dedup.dedupIndex(hist, "doc_id", "text", k = 16, bands = 2), dir)
        // c1 is LOCALIZED before the append — not just for the delete
        // below: a lazy c1 carried into the final union would put the
        // pre- and post-append scans of the SAME store path into one
        // plan, where Spark canonicalizes file scans by root path
        // (InMemoryFileIndex.equals) and scan/exchange reuse silently
        // serves c2 the PRE-append snapshot (measured at sf0.01: all 11
        // folded re-crawls leaked as kept). See DedupIndexIO.load's
        // cross-generation contract.
        val c1Lazy = Dedup.incrementalStatus(inc1,
          graft.dedup.DedupIndexIO.load(s, dir),
          "doc_id", "text", k = 16, bands = 2)
        val c1 = s.createDataFrame(
          java.util.Arrays.asList(c1Lazy.collect(): _*), c1Lazy.schema)
        val kept1 = c1.filter($"status" === "kept")
          .select($"doc_id", $"text")
        graft.dedup.DedupIndexIO.append(s, dir, kept1, "text")
        val c2 = Dedup.incrementalStatus(inc2,
          graft.dedup.DedupIndexIO.load(s, dir),
          "doc_id", "text", k = 16, bands = 2)
        val out = c1.select($"doc_id", lit(1).as("increment"), $"status")
          .unionByName(
            c2.select($"doc_id", lit(2).as("increment"), $"status"))
        // bounded result copied out so the temp store can be deleted
        // before returning (a lazy frame would pin the files)
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally Tables.deleteTree(tmp)
    }),

    // the REPLAY contract of the stored exact-keys cycle, driver-gated:
    // batch 1 runs through Dedup.incrementalStatusStored with gen=1
    // (classify off the store, fold kept keys tagged gen 1), is then
    // REPLAYED with the same gen — the crashed-foreachBatch-attempt
    // shape, where the first attempt's fold already landed — and batch
    // 2 follows at gen=2. The oracle emits attempt 1's rows TWICE: if
    // the replay ever saw its own folded keys (its kept docs flipping
    // to exact_hist), the compare fails. attempt 3 additionally proves
    // the gen<2 view DOES include batch 1's folds (re-crawls caught).
    "dedup_stored_replay" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
      val inc1 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 0)
        .select($"doc_id", $"text")
      val inc2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 1)
        .select($"doc_id", $"text")
        .unionByName(inc1.filter(pmod($"doc_id", lit(4)) === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_key_replay")
      val dir = tmp.resolve("idx").toUri.toString
      try {
        graft.dedup.DedupIndexIO.save(
          Dedup.dedupIndex(hist, "doc_id", "text", k = 16, bands = 2), dir)
        // each call returns a LOCALIZED frame (the stored cycle
        // collects internally), so the union below never re-reads the
        // store and the temp dir can be deleted before returning
        val a1 = Dedup.incrementalStatusStored(s, dir, inc1,
          "doc_id", "text", gen = Some(1L))
        val a1r = Dedup.incrementalStatusStored(s, dir, inc1,
          "doc_id", "text", gen = Some(1L))
        val a2 = Dedup.incrementalStatusStored(s, dir, inc2,
          "doc_id", "text", gen = Some(2L))
        a1.select($"doc_id", lit(1).as("attempt"), $"status")
          .unionByName(
            a1r.select($"doc_id", lit(2).as("attempt"), $"status"))
          .unionByName(
            a2.select($"doc_id", lit(3).as("attempt"), $"status"))
      } finally Tables.deleteTree(tmp)
    }),

    // the REPLAY contract of the stored SEMANTIC cycle (r16) — the
    // third leg carries the same crash-retry guarantee the exact-keys
    // leg got in r15: batch 1 classifies off the store with gen=1 and
    // folds its kept docs' codes tagged batchGen=1; the batch is then
    // REPLAYED (classify again under gen=1 — the first attempt's fold
    // already landed, but the gen bound hides the batch's own rows,
    // including its within-batch near-dup copies — and re-fold, which
    // the folded-batch ledger makes a no-op); batch 2 follows at gen=2
    // and must read batch 1's kept re-crawls as sem_hist. Attempts 1
    // and 2 emit identical rows by the contract; the final row pins the
    // fragment count so a replayed fold that wrote a second fragment
    // breaks the digest. No SQL oracle (codebooks/ADC) — digest-pinned
    // (GoldenDigestsSpec + the ExtensionsSpec cycle pin).
    "dedup_semantic_stored_replay" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val b1base = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 0)
        .select($"doc_id", $"text")
      // within-batch near-dup copies: the rows an UNBOUNDED replay
      // would flip to sem_hist against their own folded originals
      val b1 = b1base.unionByName(
        b1base.filter(pmod($"doc_id", lit(8)) === 0)
          .select(($"doc_id" + 500000).as("doc_id"), $"text"))
      val b2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 1)
        .select($"doc_id", $"text")
        .unionByName(b1base.filter(pmod($"doc_id", lit(4)) === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_sem_replay")
      val dir = tmp.resolve("idx").toUri.toString
      def localized(df: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame =
        s.createDataFrame(
          java.util.Arrays.asList(df.collect(): _*), df.schema)
      try {
        graft.dedup.SemanticIndexIO.save(Fixtures.histSemanticIdx(s, d), dir)
        // localize before the fold: the classify plan reads the
        // generation tree the fold's post-flip sweep replaces
        val a1 = localized(graft.dedup.Dedup.semanticStatusStored(
          s, dir, b1, "doc_id", "text", gen = Some(1L)))
        val kept1 = a1.filter($"status" === "kept")
          .select($"doc_id", $"text")
        def fold(): Unit = graft.dedup.SemanticIndexIO.appendSave(s, dir,
          graft.dedup.Dedup.semanticEncode(
            graft.dedup.SemanticIndexIO.load(s, dir), kept1,
            "doc_id", "text"),
          batchGen = Some(1L))
        fold()
        val a1r = localized(graft.dedup.Dedup.semanticStatusStored(
          s, dir, b1, "doc_id", "text", gen = Some(1L)))
        fold() // replayed fold: ledger no-op, no second fragment
        val a2 = localized(graft.dedup.Dedup.semanticStatusStored(
          s, dir, b2, "doc_id", "text", gen = Some(2L)))
        val frags = graft.dedup.SemanticIndexIO.fragmentCount(s, dir)
        graft.dedup.Dedup.releaseStoredClassifyCache()
        val out = a1.select($"doc_id", lit(1).as("attempt"), $"status")
          .unionByName(
            a1r.select($"doc_id", lit(2).as("attempt"), $"status"))
          .unionByName(
            a2.select($"doc_id", lit(3).as("attempt"), $"status"))
          .unionByName(Seq((-1L, 4, s"frags=$frags"))
            .toDF("doc_id", "attempt", "status"))
        localized(out)
      } finally Tables.deleteTree(tmp)
    }),

    // the full text->vector->near-dup path over RAW documents: hashed
    // set-of-words embeddings (no shipped vectors needed) feed the same
    // blocked cosine pairing the embeddings table uses; oracle-checked
    // end to end because every stage is md5/IEEE-portable
    "dedup_text_embedding_pairs" -> ((s, d) => {
      import s.implicits._
      graft.similarity.Similarity.cosineNearDupPairs(
        graft.text.TextAnalysis.hashedEmbeddings(
            Tables.documents(s, d), "doc_id", "text", dim = 64)
          .withColumn("blk", ($"doc_id" / 100).cast("long")),
        "doc_id", "embedding", threshold = 0.98, block = Some("blk"))
    }),

    // blocked form: quadratic only within each 150-id block (the block
    // key stands in for an LSH bucket / cluster id at scale); threshold
    // 0.4 sits inside the corpus' sim range so the oracle compares
    // nonzero rows (0.5 was above the max pairwise sim -> vacuous green)
    "dedup_embedding_pairs" -> ((s, d) => {
      import s.implicits._
      graft.similarity.Similarity.cosineNearDupPairs(
        Tables.embeddings(s, d).filter($"vec_id" < 600)
          .withColumn("blk", ($"vec_id" / 150).cast("long")),
        "vec_id", "embedding", threshold = 0.4, block = Some("blk"))
    })
  )

  private val ltoks =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)"""

  private val storedLoopCtes =
    s"""WITH hist AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
         |inc1 AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 3 = 0 AND doc_id % 2 = 0),
         |inc2 AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 3 = 0 AND doc_id % 2 = 1
         |  UNION ALL
         |  SELECT doc_id + 200000 AS doc_id, text FROM documents
         |  WHERE doc_id % 3 = 0 AND doc_id % 2 = 0 AND doc_id % 4 = 0),
         |hfp AS (
         |  SELECT DISTINCT
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS key
         |  FROM hist),
         |htok AS (SELECT DISTINCT doc_id, unnest($ltoks) AS w FROM hist),
         |hmh AS (
         |  SELECT doc_id, j, min(md5(j || ':' || w)) AS m
         |  FROM htok CROSS JOIN generate_series(0, 15) s(j)
         |  GROUP BY doc_id, j),
         |hbk AS (
         |  SELECT DISTINCT
         |    md5((j // 8) || '|' || string_agg(m, '|' ORDER BY j)) AS key
         |  FROM hmh GROUP BY doc_id, j // 8),
         |i1fp AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS key
         |  FROM inc1),
         |i1tok AS (SELECT DISTINCT doc_id, unnest($ltoks) AS w FROM inc1),
         |i1mh AS (
         |  SELECT doc_id, j, min(md5(j || ':' || w)) AS m
         |  FROM i1tok CROSS JOIN generate_series(0, 15) s(j)
         |  GROUP BY doc_id, j),
         |i1bk AS (
         |  SELECT doc_id,
         |    md5((j // 8) || '|' || string_agg(m, '|' ORDER BY j)) AS key
         |  FROM i1mh GROUP BY doc_id, j // 8),
         |c1 AS (
         |  SELECT b.doc_id,
         |    CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_hist'
         |         WHEN nr.doc_id IS NOT NULL THEN 'near_hist'
         |         ELSE 'kept' END AS status
         |  FROM inc1 b
         |  LEFT JOIN (SELECT DISTINCT doc_id FROM i1fp
         |             WHERE key IN (SELECT key FROM hfp)) ex
         |    ON b.doc_id = ex.doc_id
         |  LEFT JOIN (SELECT DISTINCT doc_id FROM i1bk
         |             WHERE key IN (SELECT key FROM hbk)) nr
         |    ON b.doc_id = nr.doc_id),
         |k1 AS (SELECT doc_id FROM c1 WHERE status = 'kept'),
         |ffp AS (
         |  SELECT key FROM hfp
         |  UNION
         |  SELECT key FROM i1fp
         |  WHERE doc_id IN (SELECT doc_id FROM k1) AND key IS NOT NULL),
         |fbk AS (
         |  SELECT key FROM hbk
         |  UNION
         |  SELECT key FROM i1bk WHERE doc_id IN (SELECT doc_id FROM k1)),
         |i2fp AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS key
         |  FROM inc2),
         |i2tok AS (SELECT DISTINCT doc_id, unnest($ltoks) AS w FROM inc2),
         |i2mh AS (
         |  SELECT doc_id, j, min(md5(j || ':' || w)) AS m
         |  FROM i2tok CROSS JOIN generate_series(0, 15) s(j)
         |  GROUP BY doc_id, j),
         |i2bk AS (
         |  SELECT doc_id,
         |    md5((j // 8) || '|' || string_agg(m, '|' ORDER BY j)) AS key
         |  FROM i2mh GROUP BY doc_id, j // 8),
         |c2 AS (
         |  SELECT b.doc_id,
         |    CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_hist'
         |         WHEN nr.doc_id IS NOT NULL THEN 'near_hist'
         |         ELSE 'kept' END AS status
         |  FROM inc2 b
         |  LEFT JOIN (SELECT DISTINCT doc_id FROM i2fp
         |             WHERE key IN (SELECT key FROM ffp)) ex
         |    ON b.doc_id = ex.doc_id
         |  LEFT JOIN (SELECT DISTINCT doc_id FROM i2bk
         |             WHERE key IN (SELECT key FROM fbk)) nr
         |    ON b.doc_id = nr.doc_id)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "dedup_exact_groups" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keeper_id, count(*) AS n_members
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_exact_keep" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |    ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,

    "dedup_tokenset_groups" ->
      s"""SELECT md5(array_to_string(list_sort(list_distinct($ltoks)), ' ')) AS sig,
         |  min(doc_id) AS keeper_id, count(*) AS n_members
         |FROM documents GROUP BY 1""".stripMargin,

    // parallel unnest zips the paragraph list with its positions; the
    // keeper window and the ordered reassembly mirror the Spark plan
    "dedup_paragraphs" ->
      """WITH p AS (
        |  SELECT doc_id, pos, para FROM (
        |    SELECT doc_id,
        |      unnest(string_split(text, chr(10))) AS para,
        |      unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
        |    FROM documents)
        |  WHERE length(trim(para)) > 0),
        |k AS (
        |  SELECT doc_id, pos, para,
        |    row_number() OVER (
        |      PARTITION BY md5(regexp_replace(lower(trim(para)), '\s+', ' ', 'g'))
        |      ORDER BY doc_id, pos) = 1 AS keep
        |  FROM p)
        |SELECT doc_id,
        |  count(*) FILTER (WHERE keep) AS n_kept,
        |  count(*) FILTER (WHERE NOT keep) AS n_dropped,
        |  coalesce(string_agg(para, chr(10) ORDER BY pos)
        |    FILTER (WHERE keep), '') AS clean_text
        |FROM k GROUP BY doc_id""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($ltoks) AS w FROM documents),
         |mh AS (
         |  SELECT doc_id, j, min(md5(j || ':' || w)) AS m
         |  FROM tok CROSS JOIN generate_series(0, 15) s(j)
         |  GROUP BY doc_id, j),
         |bk AS (
         |  SELECT doc_id,
         |    md5((j // 4) || '|' || string_agg(m, '|' ORDER BY j)) AS bucket
         |  FROM mh GROUP BY doc_id, j // 4)
         |SELECT DISTINCT rep AS id_a, doc_id AS id_b FROM (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY bucket) AS rep FROM bk)
         |WHERE doc_id <> rep""".stripMargin,

    "dedup_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id,
        |    l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
        |        FROM documents)
        |  CROSS JOIN generate_series(1, 1000) t(i)
        |  WHERE i <= len(l) - 4),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_inter,
        |  ca.n_sh + cb.n_sh - n_inter AS n_union
        |FROM inter
        |JOIN cnt ca ON id_a = ca.doc_id
        |JOIN cnt cb ON id_b = cb.doc_id
        |WHERE n_inter * 10 >= (ca.n_sh + cb.n_sh - n_inter) * 8""".stripMargin,

    "dedup_incremental" ->
      s"""WITH hist AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
         |batch AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents
         |  WHERE doc_id % 3 <> 0 AND doc_id % 10 = 1),
         |hfp AS (
         |  SELECT DISTINCT
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS key
         |  FROM hist),
         |htok AS (SELECT DISTINCT doc_id, unnest($ltoks) AS w FROM hist),
         |hmh AS (
         |  SELECT doc_id, j, min(md5(j || ':' || w)) AS m
         |  FROM htok CROSS JOIN generate_series(0, 15) s(j)
         |  GROUP BY doc_id, j),
         |hbk AS (
         |  SELECT DISTINCT
         |    md5((j // 8) || '|' || string_agg(m, '|' ORDER BY j)) AS key
         |  FROM hmh GROUP BY doc_id, j // 8),
         |btok AS (SELECT DISTINCT doc_id, unnest($ltoks) AS w FROM batch),
         |bmh AS (
         |  SELECT doc_id, j, min(md5(j || ':' || w)) AS m
         |  FROM btok CROSS JOIN generate_series(0, 15) s(j)
         |  GROUP BY doc_id, j),
         |bbk AS (
         |  SELECT doc_id,
         |    md5((j // 8) || '|' || string_agg(m, '|' ORDER BY j)) AS key
         |  FROM bmh GROUP BY doc_id, j // 8),
         |ex AS (
         |  SELECT DISTINCT doc_id FROM batch
         |  WHERE md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |    IN (SELECT key FROM hfp)),
         |nr AS (
         |  SELECT DISTINCT b.doc_id FROM bbk b JOIN hbk h ON b.key = h.key)
         |SELECT b.doc_id,
         |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_hist'
         |       WHEN nr.doc_id IS NOT NULL THEN 'near_hist'
         |       ELSE 'kept' END AS status
         |FROM batch b
         |LEFT JOIN ex ON b.doc_id = ex.doc_id
         |LEFT JOIN nr ON b.doc_id = nr.doc_id""".stripMargin,

    // the stored evolution loop, replayed declaratively: classify inc1
    // against history's keys, fold ONLY inc1-kept docs' keys in, then
    // classify inc2 (incl. its +200000 re-crawls) against the union.
    // Geometry matches the Spark side: k=16, bands=2 -> j // 8
    "dedup_incremental_stored" ->
      s"""$storedLoopCtes
         |SELECT doc_id, 1 AS increment, status FROM c1
         |UNION ALL
         |SELECT doc_id, 2 AS increment, status FROM c2""".stripMargin,

    // the replay contract: attempt 1 emitted twice = a gen-bounded
    // replay must be bit-identical to its first attempt; attempt 3 =
    // the next batch sees attempt 1's folds
    "dedup_stored_replay" ->
      s"""$storedLoopCtes
         |SELECT doc_id, 1 AS attempt, status FROM c1
         |UNION ALL
         |SELECT doc_id, 2 AS attempt, status FROM c1
         |UNION ALL
         |SELECT doc_id, 3 AS attempt, status FROM c2""".stripMargin,

    // hashed-embedding stage mirrors the text_hash_embed oracle
    // (TextQueries), cosine stage mirrors dedup_embedding_pairs below —
    // both already proven; FLOAT casts keep the stored-vector identity
    "dedup_text_embedding_pairs" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_distinct($ltoks) AS w FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    [coalesce(list_sum([
         |        CASE WHEN ('0x' || substring(md5(x), 1, 8))::BIGINT % 64 = i
         |          THEN CASE WHEN ('0x' || substring(md5(x), 9, 1))::BIGINT < 8
         |            THEN 1.0 ELSE -1.0 END
         |          ELSE 0.0 END
         |      for x in w]), 0.0)
         |     for i in range(0, 64)] AS hist
         |  FROM t),
         |n AS (
         |  SELECT doc_id, hist,
         |    sqrt(list_sum(list_transform(hist, x -> x * x))) AS nrm
         |  FROM h),
         |v AS (
         |  SELECT doc_id,
         |    CASE WHEN nrm = 0
         |      THEN list_transform(hist, x -> CAST(x AS FLOAT))
         |      ELSE list_transform(hist, x -> CAST(x / nrm AS FLOAT)) END
         |      AS embedding,
         |    doc_id // 100 AS blk
         |  FROM n),
         |scored AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    round(
         |      list_sum(list_transform(list_zip(a.embedding, b.embedding),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(a.embedding,
         |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(b.embedding,
         |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS sim
         |  FROM v a JOIN v b ON a.blk = b.blk AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, sim FROM scored WHERE sim >= 0.98""".stripMargin,

    "dedup_embedding_pairs" ->
      """WITH v AS (
        |  SELECT vec_id, embedding, vec_id // 150 AS blk
        |  FROM embeddings WHERE vec_id < 600),
        |scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS sim
        |  FROM v a JOIN v b ON a.blk = b.blk AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM scored WHERE sim >= 0.4""".stripMargin
  )
}
