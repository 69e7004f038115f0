package graft

/** Input-adaptive AQE partition sizing (Tuning.autoShuffle). */
class TuningSpec extends SparkSpec {

  private val Key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  test("autoShuffle installs the parallelism floor and respects overrides") {
    import spark.implicits._
    spark.conf.unset(Key)
    try {
      val p = Tuning.autoShuffle(spark, Tuning.estimatedBytes(Seq(1).toDF("x")))
      assert(p === 32, "local[4]: 8x parallelism floor (measured optimum)")
      assert(spark.conf.get(Key) === "32")
      // second call sees the installed value, not a recompute
      assert(Tuning.autoShuffle(spark) === 32)

      spark.conf.set(Key, "77")
      assert(Tuning.autoShuffle(spark) === 77, "explicit setting wins")
    } finally spark.conf.unset(Key)
  }

  test("autoShuffle scales with the caller's byte estimate") {
    spark.conf.unset(Key)
    try {
      // 1 TiB estimate / 256 MiB per-partition target = 4096 partitions
      val p = Tuning.autoShuffle(spark, BigInt(1L << 40))
      assert(p === 4096)
      spark.conf.unset(Key)
      // the cap bounds runaway estimates
      assert(Tuning.autoShuffle(spark, BigInt(1L << 60)) === 65536)
    } finally spark.conf.unset(Key)
  }

  test("autoShuffle is a no-op with AQE off") {
    spark.conf.unset(Key)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Tuning.autoShuffle(spark, BigInt(1L << 40))
      assert(p === spark.conf.get("spark.sql.shuffle.partitions").toInt)
      assert(spark.conf.getOption(Key).isEmpty,
        "no initial partition count installed without runtime coalescing")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset(Key)
    }
  }
}
