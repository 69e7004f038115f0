package graft

/** Committed golden digests for every harness query the driver can only
  * rows-check (no ANSI-SQL oracle exists: engine-specific hashes, float
  * scoring, stubbed codec). The digest (row count + sum of per-row
  * xxhash64 over name-sorted stringified columns, GoldenMain.digest) is
  * order- and partitioning-independent; each query below is itself
  * deterministic (rounded scores with id tiebreakers, splitmix64 planes,
  * content-hash ids), verified by back-to-back identical runs.
  *
  * Together with the flagship (E2eSpec) and a2_overflow/a7_counter_dump
  * (OpsSpec/ConsolidatorSpec) pins, EVERY registered query now has either
  * a DuckDB oracle or a committed digest — the driver cannot see silent
  * drift on any of them. Regenerate a value with
  * `Test/runMain graft.gaf.GoldenMain /root/testdata/sf0.01 <query>`
  * ONLY for an intentional, explained semantics change.
  */
class GoldenDigestsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def check(name: String, rows: Long, hashSum: String): Unit =
    test(s"$name golden digest at sf0.01") {
      val (n, s) = gaf.GoldenMain.digest(SparkEntry.queries(name)(spark, sf))
      assert(n === rows)
      assert(s === new java.math.BigDecimal(hashSum))
    }

  // sim_ivf_* re-pinned r5: the quantizer is now Lloyd-TRAINED
  // (Similarity.trainIvfCentroids — deterministic decimal means);
  // mm_decode_features re-pinned r5: real imageio width/height columns
  // joined the output (null for the non-image harness payloads)
  check("sim_ivf_topk", 50L, "-30697647038325938886")
  check("sim_lsh_topk", 50L, "-33633429944652742266")
  check("sim_ivf_build", 23L, "-12966050742423290877")
  check("dedup_simhash_pairs", 15698L, "54519024930998173170")
  check("text_rolling_fingerprint", 500L, "-15028130188720254520")
  check("mm_decode_features", 500L, "28829225139155658480")
  check("ev_merge_replay", 450L, "6725000057474321672")
  check("corpus_curate_e2e", 48L, "2569338463195615679")
  // r7: true merge-table BPE — train is content-deterministic (hash-
  // ordered sample, lexicographic tie-breaks), verified by back-to-back
  // identical digests
  check("text_bpe_exact", 500L, "54469054714186344608")
  // r15 session 2: whole-corpus trainer — exact global pre-token
  // frequencies, vocab-bounded driver merge loop; 127 rows because
  // training stops when no pair repeats (< the configured 200 merges
  // on this corpus's vocabulary). Back-to-back identical digests;
  // trainer parity with trainLocal pinned in BpeSpec.
  check("text_bpe_corpus", 127L, "9639374066019633020")
  // r16: byte-alphabet mode — the digest EQUALS text_bpe_exact's, and
  // must: this corpus is pure ASCII, where the GPT-2 byte→char table is
  // a per-symbol bijection and BPE is equivariant under alphabet
  // bijections, so counts coincide exactly (the conservative-upgrade
  // invariant). The divergent non-Latin case (multi-byte codepoints,
  // byteDecode round-trip, alphabet coverage) is pinned in BpeSpec.
  check("text_bpe_exact_bytes", 500L, "54469054714186344608")
  // r7: int8-quantized ANN (cosine on the codes; scale-invariant)
  check("sim_int8_topk", 50L, "47101543231917959576")
  // r11: product-quantization ANN (8 B/vector ADC retrieve + exact
  // re-rank at rFactor=20; decimal-mean Lloyd training) — no SQL form
  // for the codebooks/ADC estimator; expression parity, recall floors,
  // and the brute-force degeneracy are in PqSpec; digests verified
  // back-to-back identical
  check("sim_pq_topk", 50L, "37046765302684013930")
  check("sim_pq_build", 16L, "-2934544668263166417")
  // r11: IVFADC (coarse probe + residual-PQ ADC + exact re-rank). The
  // sf0.01 digest EQUALS sim_ivf_topk's by semantics, not by accident:
  // ADC's top-k*10 contains the probed buckets' true top-5 here, and
  // whenever containment holds the re-ranked output IS the exact IVF
  // probe (the PqSpec equivalence). At sf0.1 the two rows diverge
  // (verified: -2217057557915718457 vs -14665822293677786946) — the
  // compressed path is a different execution, same probe geometry.
  check("sim_ivfpq_topk", 50L, "-30697647038325938886")
  // r12: the STORED form — index written partitionBy(cent_bucket), read
  // back, cut to the probed cells (partition filter at the scan, pruning
  // pinned in PlanSpec), searched. Same codes, same search: the digest
  // EQUALS sim_ivfpq_topk's by construction.
  check("sim_ivfpq_pruned", 50L, "-30697647038325938886")
  // r11: semantic crawl-increment classification (the third index leg
  // after exact keys and Bloom bits): hashed embeddings -> memoized PQ
  // code table -> ADC retrieve + exact rerank -> threshold status. No
  // SQL form (codebooks/ADC); re-crawl-catch + threshold-partition
  // contracts in ExtensionsSpec; digest verified back-to-back
  // (re-pinned same round: the classifier moved from a flat ADC scan to
  // the IVFADC probe — same statuses at sf0.01/sf0.1, sub-threshold
  // best-match audit columns legitimately differ; 12s -> 2.8s per
  // increment and linear-per-doc at a fixed probe fraction)
  check("dedup_incremental_semantic", 201L, "-58008146332422194395")
  // r11: the semantic loop's evolution step — inc1-kept docs appended
  // (encoded with the existing quantizers), inc2's re-crawls of them
  // must read sem_hist off the grown index; contracts in ExtensionsSpec
  check("dedup_incremental_semantic_fold", 209L, "5764935742945909182")
  // EQUALS the in-memory fold loop's digest by construction: the stored
  // cycle (save -> statusStored w/ partition prune -> appendSave ->
  // statusStored) round-trips bit-exactly (r13; GoldenMain run twice)
  check("dedup_semantic_stored", 209L, "5764935742945909182")
  // r16: the semantic leg's crash-retry contract (gen-bounded classify
  // + folded-batch ledger): attempts 1 and 2 emit IDENTICAL rows (the
  // replay cannot see its own fold, including within-batch +500000
  // copies), attempt 3 proves the gen<2 view includes batch 1's fold,
  // and the frags=N row pins the replayed fold as a no-op. Digest
  // verified back-to-back identical; cycle contract in ExtensionsSpec.
  check("dedup_semantic_stored_replay", 336L, "148107579587593132617")
  // r11: the same loop as a STREAM — foreachBatch classify + grow-from-
  // written-parquet; one addData block per increment makes the batch
  // boundary (= the semantics) deterministic. Streaming-equals-batch
  // parity in StreamingSpec; digest verified back-to-back
  check("ev_dedup_semantic", 209L, "152163444404646366878")
  // r7: SemDeDup (trained-quantizer clusters -> within-cluster near-dup
  // components); k-means training has no SQL form, rows-only for the
  // driver — invariants in CurationSpec, digest verified back-to-back
  check("sim_semdedup", 500L, "23102979320652351245")
  // r7: hashed-BoW logistic quality scorer (driver-trained, map-only
  // scoring); gradient descent has no SQL form — digest verified
  // back-to-back identical
  check("text_quality_classifier", 450L, "178734100278674131171")
  // r7: full-config curate (classic composition + classifier gate +
  // perplexity gate + cross-doc span dedup, thresholds measured by
  // CurateFullProbeMain); digest verified back-to-back identical
  check("corpus_curate_full", 46L, "13732983899389218483")
  // r8: sketch stats split — the portable scalar columns moved to the
  // oracled corpus_sketch_stats surface; the HLL++ estimate (engine-
  // specific, no SQL oracle, but DETERMINISTIC: max-merge registers,
  // order/partitioning independent — pinned in CorpusOpsSpec) rides
  // this surface; digest verified back-to-back identical
  check("corpus_sketch_hll", 20L, "-6589303582331205121")
  // r7: Bloom-index incremental dedup — filter bits aren't
  // SQL-expressible (no oracle) but are the OR of per-key scatters:
  // order/partitioning-independent, digest verified back-to-back
  // identical; one-sided-error contract vs the exact path pinned in
  // ExtensionsSpec
  check("dedup_incremental_bloom", 201L, "-35337134575005675953")
  // r7: quantile-mode curate (the scale-stable perplexity gate inside
  // the full composition); digest verified back-to-back identical,
  // wiring invariant in CurationSpec
  check("corpus_curate_quantile", 31L, "-8274052756616005695")
  // r7: SemDeDup over RAW text via hashed embeddings (no shipped
  // vectors); digest verified back-to-back identical
  check("sim_semdedup_text", 500L, "-221115505242612320926")
  // r7: per-increment curate (history-index cut -> standard
  // composition); digest verified back-to-back identical, history-dup
  // disjointness in CurationSpec
  check("corpus_curate_increment", 12L, "792833489907115093")
  // r8: SemDeDup as a curate() stage (threshold 0.9 — the measured
  // non-vacuous operating point, CurateSemProbeMain); digest verified
  // back-to-back identical, subset invariant in CurationSpec
  check("corpus_curate_semantic", 47L, "8670201794719716203")
  // r8: Bloom-form increment — the map-only history cut. The digest
  // EQUALS corpus_curate_increment's: zero Bloom false positives at
  // sf0.01, so the one-sided-error containment (kept ⊆ exact-kept,
  // CurationSpec) holds as equality here; verified back-to-back
  // identical
  check("corpus_curate_increment_bloom", 12L, "792833489907115093")
  // r9: classic curate + line-level filter (fabricated lines, same
  // scheme as text_line_filter) + per-doc salient terms flattened to
  // scalar (doc, rank, term) rows; digest verified back-to-back
  // identical; shrink/terms non-vacuity + classic-subset invariants in
  // CurationSpec
  check("corpus_curate_lines_terms", 141L, "92528141479739361253")
  // r9: the FULL multi-species orchestration (runAll: human -> mouse ->
  // chinchilla-last, U5 time-zero-snapshot stale delete) over augmented
  // harness dims; surrogate keys are the deterministic hash-bucket
  // scheme, so the final table digests stably; verified back-to-back
  // identical; non-vacuity of every orchestration contract in RunnerSpec.
  // r10 re-pin: human/mouse facts sliced to l_orderkey%4==0 (quarter
  // scale) so the row stops being 36% of the bench wall — same plan
  // shape, every RunnerSpec contract still fires
  check("gaf_runner_multispecies", 24076L, "-1563517745009941834371")
  // r9: two-level SemDeDup — coarse Lloyd argmax (driver literal) +
  // per-cell fine argmax via broadcast cells + NearestInCellExpr;
  // distributed fine Lloyd uses the same exact-decimal means, so the
  // digest is partitioning-independent; verified back-to-back
  // identical; flat-degenerate equality + invariants in ExtensionsSpec
  check("sim_semdedup_hier", 500L, "-70211603250037514473")
  // r9: Bloom index EVOLUTION — build on history, classify inc1, FOLD
  // inc1's kept docs into the same filters, classify inc2 (which
  // re-crawls inc1-kept pages under fresh ids — those must read
  // exact_hist off the grown index). Bits stay OR-of-scatters, so
  // order/partitioning-independent; digest verified back-to-back
  // identical; fold purity + saturation guard pinned in ExtensionsSpec
  check("dedup_incremental_bloom_fold", 209L, "-87383621975144849642")
  // r8: streaming incremental dedup driven end-to-end on a MemoryStream
  // (two increments; cross-batch content-dup suppression); kept-id set
  // deterministic (unbounded exact state, fixed arrival order); digest
  // verified back-to-back identical, batch parity in StreamingSpec
  check("ev_dedup_incremental", 29L, "14160447500710946773")
}
