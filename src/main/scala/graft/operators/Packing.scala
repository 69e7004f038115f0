package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: assign documents to
  * fixed-token-budget training sequences ("concat-and-chunk", the
  * packing GPT-style pipelines actually run — concatenate the token
  * stream in a deterministic order, cut every `budget` tokens).
  *
  * Token-budget caveat: `tokenCol` is whatever count the caller
  * supplies. When it is [[graft.text.TextAnalysis.bpeTokenCount]], note
  * that count is a GPT-2-style PRE-tokenizer regex proxy, not a
  * merge-table BPE — budgets are approximate relative to any specific
  * model's tokenizer (typically an over-count, since merges only fuse
  * pre-tokens). The packing arithmetic itself is exact for whatever
  * counts it is given; swap in real tokenizer counts and nothing here
  * changes.
  */
object Packing {

  /** Assign each row a `(pack_bucket, pack_seq)` pack id: rows stream in
    * `idCol` order within `pack_bucket = idCol % buckets`, and a row
    * belongs to the chunk containing its FIRST token —
    * `pack_seq = floor(tokens_before_it_in_bucket / budget)`. A document
    * straddling a boundary stays in the chunk it starts in (its tail
    * spills into the next chunk's budget, exactly like the flat token
    * stream it models).
    *
    * Deterministic: bucket and order derive only from ids. Scale shape:
    * ONE hash shuffle on `pack_bucket` plus a per-bucket running sum —
    * each bucket is a single window partition, so `buckets` is the
    * parallelism knob and must exceed the cluster's cores at scale
    * (buckets are independent token streams; more buckets = same
    * semantics, smaller partitions). No driver-side state, no collect.
    */
  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Long, buckets: Int,
                 extraKeys: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    // extraKeys scope the token streams (e.g. pack WITHIN a train/val/
    // test split so sequences never mix splits) — same single shuffle,
    // the keys just join the partitioning
    val w = Window.partitionBy((extraKeys :+ "pack_bucket").map(col): _*)
      .orderBy(col(idCol))
    df.withColumn("pack_bucket", pmod(col(idCol), lit(buckets)).cast("int"))
      .withColumn("_start", sum(col(tokenCol)).over(w) - col(tokenCol))
      // pack_seq stays LONG: a bucket's cumulative token count over a
      // 100 TB corpus divided by a ~2k budget overflows int (~4.4e12
      // tokens per bucket is enough)
      .withColumn("pack_seq", floor(col("_start") / budget))
      .drop("_start")
  }

  /** Assemble the actual training sequences: one row per
    * (extraKeys, pack_bucket, pack_seq) with the member texts
    * concatenated in `idCol` order — the record a data loader reads.
    *
    * Scale shape: ONE exchange total. The window inside [[packChunks]]
    * hash-partitions on `pack_bucket`; the assembly groupBy's key set
    * (bucket, seq) is a SUPERSET of that partitioning, so the clustered
    * distribution is already satisfied and the aggregation reuses the
    * same exchange — pinned by PlanSpec. Member order inside a sequence
    * is deterministic without a sort exchange: collect_list's arbitrary
    * arrival order is canonicalized by `array_sort` over (id, text)
    * structs (struct ordering = field order, id first). A sequence's
    * in-memory size is bounded by `budget` tokens plus one straddling
    * document, the same bound the training run itself needs.
    */
  def assemble(df: DataFrame, idCol: String, textCol: String,
               tokenCol: String, budget: Long, buckets: Int,
               extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = extraKeys ++ Seq("pack_bucket", "pack_seq")
    packChunks(df, idCol, tokenCol, budget, buckets, extraKeys)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          x => x.getField(textCol)), " ").as("seq_text"))
  }

  /** Deterministic balanced shard id for training-data delivery
    * (WebDataset-style fixed shard counts): the content digest's first
    * 8 hex digits scaled into `[0, nShards)` — equal-width ranges over
    * the same md5 family every [[Sampling]] op keys on, so shard
    * membership is a pure function of (salt, key): stable across runs,
    * partitionings, and engines, and each shard holds ~1/nShards of the
    * corpus by the digest's uniformity. Map-only codegen'd expression;
    * the write side is one shuffle keyed on it
    * (`repartition(col("shard")).write.partitionBy("shard")`).
    * The scale-out product `digest * nShards` stays ≤ 2^48 (exact in
    * the double `floor`), enforced by the 65536 cap.
    */
  def assignShard(key: Column, nShards: Int, salt: String = ""): Column = {
    require(nShards >= 1 && nShards <= 65536,
      s"nShards must be in [1, 65536], got $nShards")
    floor(conv(substring(Sampling.sampleHash(key, salt), 1, 8), 16, 10)
      .cast("long") * nShards / 4294967296.0).cast("int")
  }

  /** Per-shard delivery manifest — the sidecar a loader reads to plan
    * work: document count and byte/token volume per shard. One
    * aggregation shuffle on the shard id; DENSE over all `nShards` rows
    * (an empty shard reports 0/0 explicitly — a loader iterating shard
    * ids must be able to distinguish "legitimately empty" from "entry
    * lost", and a sparse groupBy output can't).
    */
  def shardManifest(df: DataFrame, key: Column, sizeCol: Column,
                    nShards: Int, salt: String = ""): DataFrame = {
    val counts = df.groupBy(assignShard(key, nShards, salt).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(sizeCol).cast("long").as("total_size"))
    df.sparkSession.range(nShards)
      .select(col("id").cast("int").as("shard"))
      .join(counts, Seq("shard"), "left")
      .na.fill(0L, Seq("n_docs", "total_size"))
  }

  /** The write side of delivery sharding: one `shard=N/` parquet
    * directory per shard id. `repartition(col("shard"))` clusters each
    * shard's rows before `partitionBy` so every shard directory is
    * written by exactly one task (without it, every task appends a file
    * to every shard directory — nShards × tasks small files, the
    * classic partitioned-write mistake). One shuffle keyed on the shard
    * id; membership is [[assignShard]]'s pure content-hash function, so
    * re-running the write reproduces identical shard contents.
    */
  def writeShards(df: DataFrame, key: Column, nShards: Int, path: String,
                  salt: String = ""): Unit =
    df.withColumn("shard", assignShard(key, nShards, salt))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
