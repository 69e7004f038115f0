package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling.
  *
  * `sample()`/`rand()` draws depend on partitioning and retries — two
  * runs (or two stages of one run) can disagree on membership. Keying
  * the draw on a content hash instead makes the sample a pure function
  * of the data: reproducible across runs, clusters, and engines, stable
  * under repartitioning, and consistent between a corpus and any derived
  * table sampled on the same key. That is the property a training-data
  * pipeline needs for held-out splits and ablation subsets.
  */
object Sampling {

  /** Keep rows whose `md5(salt || key)` hex digest sorts below
    * `thresholdHex` (lowercase hex, lexicographic = numeric order for
    * the uniform digest). The keep rate is `0x<thresholdHex> / 16^len`:
    * e.g. `"1a"` keeps 26/256 ≈ 10.2%. Different salts give independent
    * samples on the same key. Map-only, codegen'd, no shuffle.
    */
  def hashSample(df: DataFrame, key: Column, thresholdHex: String,
                 salt: String = ""): DataFrame = {
    validateThreshold(thresholdHex)
    df.filter(sampleHash(key, salt) < lit(thresholdHex))
  }

  /** Uppercase hex would compare below all lowercase digests (silent
    * rate bias) and anything past 32 chars outruns the md5 digest and
    * breaks the documented rate formula — reject both loudly.
    */
  private def validateThreshold(thresholdHex: String): Unit =
    require(thresholdHex.nonEmpty && thresholdHex.length <= 32 &&
      thresholdHex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"thresholdHex must be 1-32 chars of lowercase hex, got '$thresholdHex'")

  /** The digest the sample is keyed on (exposed so callers can stratify
    * or bucket on it).
    */
  def sampleHash(key: Column, salt: String = ""): Column =
    md5(concat(lit(salt), key.cast("string")).cast("binary"))

  /** Deterministic train/val/test split assignment: buckets the sample
    * digest by cumulative thresholds, so every row gets exactly one
    * split label as a pure function of (salt, key) — stable across
    * runs, partitionings, and engines, and consistent with
    * [[hashSample]] on the same key/salt. `splits` is ordered
    * (name, weight): weights must be positive and sum to 1 (±1e-9).
    * Each non-final split's rate is exact to 16^-8 ≈ 2.3e-10 (the
    * cumulative fraction rounded to an 8-hex-digit threshold); the
    * final split takes the remainder, so assignment is exhaustive.
    * Map-only codegen'd CASE chain, no shuffle.
    */
  def assignSplit(key: Column, splits: Seq[(String, Double)],
                  salt: String = ""): Column = {
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be distinct: ${splits.map(_._1)}")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      f"split weights must sum to 1, got $total%.12f")
    val h = sampleHash(key, salt)
    val cums = splits.init.map(_._2).scanLeft(0.0)(_ + _).tail
    val rest = splits.tail.init.map(_._1).zip(cums.tail)
    rest.foldLeft(when(h < lit(hex8(cums.head)), splits.head._1)) {
      case (acc, (name, cum)) => acc.when(h < lit(hex8(cum)), name)
    }.otherwise(splits.last._1)
  }

  /** Cumulative fraction -> 8-hex-digit digest threshold. */
  private[operators] def hex8(frac: Double): String =
    f"${math.round(frac * 4294967296.0)}%08x"

  /** Apply mixture rates as deterministic per-stratum RESAMPLING —
    * rates may exceed 1 (the low-resource upsampling that
    * [[graft.text.CorpusQc.mixtureWeights]] produces): each row is
    * emitted `floor(rate)` times, plus one more iff its sample digest
    * falls below the fractional part's threshold — expected copies =
    * rate exactly, membership a pure function of (salt, key) like every
    * sampler here. Output adds an `epoch` column (1..n, the copy index
    * a data loader shuffles on). Unlisted strata are dropped; rate 0
    * drops the stratum. Map-only codegen'd projection + a bounded
    * `explode` — no shuffle, no rand(), no partitioning dependence.
    * `maxRate` (default 16) bounds the fan-out a typo can cause.
    */
  def resampleByRates(df: DataFrame, key: Column, stratum: Column,
                      rates: Map[String, Double], salt: String = "",
                      maxRate: Double = 16.0): DataFrame = {
    require(rates.nonEmpty, "rates must not be empty")
    rates.foreach { case (k, r) =>
      require(r >= 0 && r <= maxRate,
        s"rate for '$k' must be in [0, $maxRate], got $r") }
    val h = sampleHash(key, salt)
    val copies = rates.foldLeft(lit(0)) { case (acc, (value, rate)) =>
      val base = math.floor(rate).toInt
      val frac = rate - base
      val n =
        if (frac == 0) lit(base)
        else lit(base) + when(h < lit(hex8(frac)), 1).otherwise(0)
      when(stratum === value, n).otherwise(acc)
    }
    df.withColumn("_n_copies", copies)
      // sequence(1, 0) generates DESCENDING [1, 0] — guard the empty case
      .withColumn("epoch", explode(when(col("_n_copies") >= 1,
        sequence(lit(1), col("_n_copies")))
        .otherwise(array().cast("array<int>"))))
      .drop("_n_copies")
  }

  /** Per-stratum rates: `thresholds` maps a stratum value (e.g. a lang
    * code) to its hex threshold; unlisted strata are dropped. One
    * codegen'd filter — the map becomes a CASE chain, not a join.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           thresholds: Map[String, String],
                           salt: String = ""): DataFrame = {
    thresholds.values.foreach(validateThreshold)
    val cases = thresholds.foldLeft(lit(null).cast("string")) {
      case (acc, (value, thr)) => when(stratum === value, lit(thr)).otherwise(acc)
    }
    df.filter(sampleHash(key, salt) < cases)
  }
}
