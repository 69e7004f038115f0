package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.text.TextAnalysis

/** Bloom-filter form of [[Dedup.dedupIndex]] — the 100 TB fast path for
  * incremental-crawl dedup.
  *
  * The exact index keeps every fp/band key (≈ tens of GB per 100 TB of
  * history) and [[Dedup.incrementalStatus]] pays two shuffle semi-joins
  * per increment. This form folds the same key sets into two Bloom
  * filters (MBs at fpp=1e-3 for millions of docs — sized by the caller,
  * `BloomFilter.optimalNumOfBits`), broadcast to executors, and
  * classification becomes a MAP-ONLY projection: no join, no shuffle,
  * no index re-read. The price is the documented one-sided error:
  * `mightContain` has no false negatives, so a true duplicate can NEVER
  * leak through as `kept`; a `kept` doc can misclassify as
  * exact/near_hist with probability ≤ fpp per probe — at curation
  * scale that means dropping ~0.1% extra novel docs, the cheap
  * direction of the trade (pinned in ExtensionsSpec: bloom `kept` ⊆
  * exact `kept`).
  *
  * Determinism: filter bits are the OR of per-key hash scatters —
  * independent of insertion order and partitioning (treeAggregate's
  * merge is the bitwise OR) — so classification digests are pinnable.
  *
  * Build uses `treeAggregate` over the key RDD: genuinely per-partition
  * imperative sketch-building, the documented RDD exception. One pass
  * over history; in deployment the serialized filters persist between
  * increments and new batch keys fold in with `putString`.
  */
object BloomIndex {

  /** The two filters plus the banding geometry they were built with
    * (classification must probe with identical band keys). Serializable
    * — broadcast-friendly, and `BloomFilter.writeTo/readFrom` is the
    * between-increments persistence format.
    */
  final case class Index(fp: BloomFilter, band: BloomFilter,
                         k: Int, bands: Int) extends Serializable

  /** Fold `df`'s exact fingerprints and LSH band keys into Bloom
    * filters. `expectedItems` is the DOCUMENT count: the fp filter
    * receives one key per doc, the band filter ~`bands`× that, so the
    * band filter is sized `expectedItems * bands` — a caller sizing to
    * its doc count gets the requested `fpp` on BOTH filters (r7
    * advice: same-size filters silently inflated the band filter's
    * effective fpp by ~bands×; overshoot is safe — fpp only drops).
    * ONE pass over history: both filters fold from the shared
    * [[Dedup.indexKeys]] derivation (no distinct — sketch inserts are
    * idempotent, so the exact index's dedup shuffles are pure overhead
    * here) in a single treeAggregate.
    */
  def build(df: DataFrame, textCol: String,
            expectedItems: Long, fpp: Double = 0.001,
            k: Int = 16, bands: Int = 4): Index = {
    import df.sparkSession.implicits._
    val (fp, band) = Dedup.indexKeys(df, textCol, k, bands)
      .as[(String, String)].rdd
      .treeAggregate(
        (BloomFilter.create(expectedItems, fpp),
          BloomFilter.create(expectedItems * bands, fpp)))(
        (acc, kv) => {
          (if (kv._1 == "fp") acc._1 else acc._2).putString(kv._2)
          acc
        },
        (a, b) => {
          a._1.mergeInPlace(b._1); a._2.mergeInPlace(b._2); a
        })
    Index(fp, band, k, bands)
  }

  /** [[Dedup.incrementalStatus]] semantics against the Bloom index:
    * map-only, zero shuffle. The two probes are one UDF each (the
    * broadcast-sketch-lookup pattern; the band probe takes the whole
    * key array so no UDF sits inside a higher-order lambda).
    */
  def classify(newDocs: DataFrame, index: Index,
               textCol: String): DataFrame = {
    val sc = newDocs.sparkSession.sparkContext
    val fpB = sc.broadcast(index.fp)
    val bandB = sc.broadcast(index.band)
    val mightFp = udf((s: String) =>
      s != null && fpB.value.mightContainString(s))
    val mightBand = udf((keys: Seq[String]) =>
      keys != null && keys.exists(bandB.value.mightContainString))
    val text = col(textCol)
    // the signature stages in its own projection: lshBandKeys builds a
    // literal array referencing it once per band, and inlining the
    // K-hash pass per element is the measured k× blowup the
    // minhashCandidates scaladoc documents (CollapseProject's non-cheap
    // guard keeps the stage)
    newDocs
      .withColumn("_sig",
        when(size(graft.functions.TokensExpr.tokens(text)) > 0,
          Dedup.minhashSignature(text, index.k)))
      .withColumn("status",
        when(mightFp(TextAnalysis.fingerprint(text)), "exact_hist")
          .when(mightBand(
            when(col("_sig").isNotNull,
              Dedup.lshBandKeys(col("_sig"), index.bands,
                index.k / index.bands))
              .otherwise(array().cast("array<string>"))), "near_hist")
          .otherwise("kept"))
      .drop("_sig")
  }
}
