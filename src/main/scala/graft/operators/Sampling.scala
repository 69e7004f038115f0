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
