package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input-adaptive shuffle sizing (BASELINE.md, 1000x postmortem).
  *
  * The first real scale wall found in this engine was NOT a plan defect:
  * at 600 M input lines the merge aggregations' per-partition state
  * outgrew `heap / spark.sql.shuffle.partitions` at the default 32
  * partitions, and raising the partition count (32 -> 256) at the SAME
  * 8 GiB heap fixed it with identical output and throughput. AQE cannot
  * make that repair on its own: coalescing starts from
  * `initialPartitionNum` (default = shuffle.partitions) and only MERGES
  * partitions — an oversized aggregation partition is never split. So
  * the durable fix is a LARGE initial partition count that AQE coalesces
  * down to the advisory size at runtime: small inputs still end up with
  * a handful of post-coalesce partitions, huge inputs keep enough
  * partitions that per-partition state stays bounded by
  * `~advisory-bytes` regardless of total volume — no manual knob.
  *
  * `autoShuffle` installs that default once per session (a caller's
  * explicit initialPartitionNum always wins), floored at 8x the session
  * parallelism and raised further when the caller's input-size estimate
  * says the scan alone warrants more.
  *
  * The floor multiplier is MEASURED, not guessed: at 1000x flagship
  * volume (600 M lines, 8 GiB heap, local[32]) a 64x floor (2048
  * initial partitions) ran 1830s while 8x (256) ran 997s on the same
  * quiet host — same output, 1.8x apart. Beyond ~64 MB per partition
  * the merge aggregations pay per-partition sort/agg constants without
  * any memory benefit, so the floor sits at the proven 8x and the
  * bytes term targets ~256 MB of input per partition. Known boundary:
  * an in-plan fan-out (explode) is invisible to the size estimate, so
  * workloads above ~1000x of this probe's shape with no real scan
  * behind them still need an explicit override; real corpora expose
  * their bytes at the scan and size correctly.
  */
object Tuning {

  /** Input bytes each initial partition should carry (the bytes-derived
    * term of [[autoShuffle]]); distinct from AQE's 64 MB post-shuffle
    * advisory — see the 1000x A/B in the scaladoc.
    */
  val TargetPartitionBytes: Long = 256L << 20

  private val FloorPerCore = 8
  private val Cap = 65536
  private val Key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  /** Marker recording the value [[autoShuffle]] itself installed, so a
    * later call can distinguish its own default from a user override:
    * self-installed values are raised monotonically (a session that runs
    * a small input first must not pin the sizing at the floor for a later
    * huge input), while a user-set value always wins untouched. Known
    * boundary: a user pin set to EXACTLY the currently-self-installed
    * number is indistinguishable from the self-install and may be raised
    * by a later bigger input — to freeze sizing, pin a value autoShuffle
    * did not itself choose, or clear this marker key after pinning.
    */
  private val SelfInstalledKey = "graft.tuning.autoShuffle.selfInstalled"

  /** Upper-bound estimate of the bytes a frame's plan READS: the sum of
    * its LEAF relations' size estimates (file sizes for parquet scans).
    * Deliberately not the root plan's `stats.sizeInBytes`: Catalyst's
    * size-only visitor MULTIPLIES child sizes through non-semi joins,
    * so a join-rooted input (e.g. curateIncrement's history-classified
    * batch) would estimate ~1e17 bytes from KB-scale scans, saturate
    * the partition cap, and stickily pin 65536 initial partitions on
    * the whole session. Generators/fan-outs are still NOT reflected —
    * the parallelism floor covers those (documented blind spot, probed
    * in the curate scale runs).
    */
  def estimatedBytes(df: DataFrame): BigInt = {
    // a leaf with NO real estimate reports spark.sql.defaultSizeInBytes
    // (Long.MaxValue by default) — summing that in would saturate the
    // partition cap off one unknown-stat leaf and stickily pin 65536
    // initial partitions on the session (seen live when snapshot
    // frames briefly lost their origin stats). Unknown contributes 0:
    // the parallelism floor is the designed fallback for inputs whose
    // size the plan can't see. Equality, not `<`: when a session tunes
    // defaultSizeInBytes to a FINITE value, a big scan with a real
    // estimate past it must still count (dropping it would land a huge
    // input at the parallelism floor — the exact OOM the cap exists to
    // prevent); only the sentinel value itself marks a stats-less leaf.
    val unknown = BigInt(df.sparkSession.conf
      .get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString))
    df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).filter(_ != unknown).sum
  }

  /** Size a frame for a durable WRITE (guide §6, r17): an
    * increment-/dimension-sized store artifact written at the session's
    * task parallelism lands as dozens of KB-scale files — each a task +
    * a commit rename at write time and a parquet footer read at every
    * later load. When the input-size estimate says the whole output
    * fits one target-sized file, funnel it through one task
    * (`repartition(1)`, an exchange — upstream still computes in
    * parallel; `coalesce(1)` would collapse the upstream computation to
    * one task). Inputs estimated bigger than `targetBytes` — or whose
    * size the plan can't see (estimate 0) — pass through unchanged, so
    * a genuinely large store keeps its parallel write.
    */
  def sizedForWrite(df: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    val est = estimatedBytes(df)
    if (est > 0 && est <= targetBytes) df.repartition(1) else df
  }

  /** Install the input-adaptive initial partition count on the session
    * unless the user already set one. No-op when AQE is off (a fixed
    * large partition count WITHOUT runtime coalescing would tax every
    * small query). Values this method installed itself are raised
    * monotonically on later calls (max of existing and newly computed),
    * so the bytes-derived term stays live for the whole session; a
    * user-set value is never touched. Returns the effective value.
    */
  def autoShuffle(spark: SparkSession, scanBytes: BigInt = 0): Int = {
    if (spark.conf.get("spark.sql.adaptive.enabled", "true") != "true")
      return spark.conf.get("spark.sql.shuffle.partitions").toInt
    val fromBytes =
      (scanBytes / TargetPartitionBytes).min(BigInt(Cap)).toInt
    val computed = math.min(Cap, math.max(
      spark.sparkContext.defaultParallelism * FloorPerCore, fromBytes))
    spark.conf.getOption(Key) match {
      case Some(v) if !spark.conf.getOption(SelfInstalledKey).contains(v) =>
        v.toInt // user override — leave untouched
      case existing =>
        val p = math.max(existing.map(_.toInt).getOrElse(0), computed)
        spark.conf.set(Key, p.toString)
        spark.conf.set(SelfInstalledKey, p.toString)
        p
    }
  }
}
