package graft

/** Input-adaptive AQE partition sizing (Tuning.autoShuffle). */
class TuningSpec extends SparkSpec {

  private val Key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
  private val Marker = "graft.tuning.autoShuffle.selfInstalled"

  private def reset(): Unit = { spark.conf.unset(Key); spark.conf.unset(Marker) }

  test("estimatedBytes sums LEAF scans — a join-rooted plan must not " +
      "inherit Catalyst's multiplied size estimate") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val scanOnly = Tuning.estimatedBytes(docs)
    // a triple self-join's root stats are ~size^3 under the size-only
    // visitor; the leaf-sum estimate stays at 3 scans (the
    // curateIncrement shape — unfixed, this saturated the 65536 cap
    // and stickily pinned it on the whole session)
    val joined = docs.join(docs.select($"doc_id"), Seq("doc_id"), "left")
      .join(docs.select($"doc_id", $"lang".as("l2")), Seq("doc_id"), "left")
    val est = Tuning.estimatedBytes(joined)
    assert(est <= scanOnly * 4, s"join-rooted estimate exploded: $est")
    assert(est >= scanOnly)
  }

  test("autoShuffle installs the parallelism floor and respects overrides") {
    import spark.implicits._
    reset()
    try {
      val p = Tuning.autoShuffle(spark, Tuning.estimatedBytes(Seq(1).toDF("x")))
      assert(p === 32, "local[4]: 8x parallelism floor (measured optimum)")
      assert(spark.conf.get(Key) === "32")
      // second small call keeps the installed value
      assert(Tuning.autoShuffle(spark) === 32)

      spark.conf.set(Key, "77")
      assert(Tuning.autoShuffle(spark) === 77, "explicit setting wins")
    } finally reset()
  }

  test("self-installed value raises monotonically; user override never moves") {
    reset()
    try {
      // small-input-first session: floor installed...
      assert(Tuning.autoShuffle(spark) === 32)
      // ...then a huge input arrives: the bytes term must still fire
      // (round-5 advice: first-call-wins partially recreated the OOM the
      // feature exists to prevent)
      assert(Tuning.autoShuffle(spark, BigInt(1L << 40)) === 4096,
        "self-installed floor raised by a later byte estimate")
      // never lowers
      assert(Tuning.autoShuffle(spark) === 4096)

      // a user-set value is immovable in BOTH directions
      spark.conf.set(Key, "64")
      assert(Tuning.autoShuffle(spark, BigInt(1L << 40)) === 64)
    } finally reset()
  }

  test("autoShuffle scales with the caller's byte estimate") {
    reset()
    try {
      // 1 TiB estimate / 256 MiB per-partition target = 4096 partitions
      val p = Tuning.autoShuffle(spark, BigInt(1L << 40))
      assert(p === 4096)
      reset()
      // the cap bounds runaway estimates
      assert(Tuning.autoShuffle(spark, BigInt(1L << 60)) === 65536)
    } finally reset()
  }

  test("autoShuffle is a no-op with AQE off") {
    reset()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Tuning.autoShuffle(spark, BigInt(1L << 40))
      assert(p === spark.conf.get("spark.sql.shuffle.partitions").toInt)
      assert(spark.conf.getOption(Key).isEmpty,
        "no initial partition count installed without runtime coalescing")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      reset()
    }
  }

  test("snapshot frames keep origin stats; unknown-stat leaves do not " +
      "saturate the partition cap") {
    import spark.implicits._
    reset()
    try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      val snap = graft.plans.Snapshot.materialize(docs.select($"doc_id", $"text"))
      try {
        // the LogicalRDD leaf must carry the origin's estimate, not
        // spark.sql.defaultSizeInBytes: a Long.MaxValue leaf (a) pinned
        // initialPartitionNum at 65536 for the whole session via the
        // sticky self-installed marker and (b) blocks broadcast planning
        // over the snapshot (seen live: a later cached stage, where AQE
        // cannot re-coalesce, ran 65536 real empty tasks)
        val est = Tuning.estimatedBytes(snap.df)
        assert(est > 0 && est < BigInt(Long.MaxValue) / 2,
          s"snapshot leaf estimate not carried from origin: $est")
        assert(Tuning.autoShuffle(spark, est) === 32,
          "snapshot-derived estimate must land at the parallelism floor")
        // belt: a genuinely unknown-stat leaf (createDataFrame over a
        // bare RDD reports defaultSizeInBytes) contributes 0 to the
        // estimate instead of saturating it
        val bareRdd = spark.sparkContext.parallelize(
          Seq(org.apache.spark.sql.Row(1L)))
        val bare = spark.createDataFrame(bareRdd,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("x",
              org.apache.spark.sql.types.LongType))))
        assert(Tuning.estimatedBytes(bare.join(docs, $"x" === $"doc_id"))
          < BigInt(Long.MaxValue) / 2)
      } finally snap.release()
    } finally reset()
  }
}
