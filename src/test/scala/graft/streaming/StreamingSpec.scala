package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.IncrementalStream.{KeyEvent, KeyUpdate}

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("touchExpire: insert, touch, then watermark-driven expiry deletes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyEvent]
    val q = IncrementalStream.touchExpire(input.toDS(), idleMs = 120000)
      .writeStream.format("memory").queryName("te_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(KeyEvent("a", ts("2026-01-01 00:00:00")))
      q.processAllAvailable()
      input.addData(KeyEvent("a", ts("2026-01-01 00:01:00")),
        KeyEvent("b", ts("2026-01-01 00:01:00")))
      q.processAllAvailable()
      val got = spark.table("te_out").as[KeyUpdate].collect()
        .map(u => (u.key, u.op, u.hits)).toSet
      assert(got === Set(("a", "insert", 1L), ("a", "touch", 2L),
        ("b", "insert", 1L)))

      // advance the watermark far past a/b's idle window -> deletes
      input.addData(KeyEvent("c", ts("2026-01-01 00:10:00")))
      q.processAllAvailable()
      input.addData(KeyEvent("c", ts("2026-01-01 00:12:00")))
      q.processAllAvailable()
      val ops = spark.table("te_out").as[KeyUpdate].collect()
        .map(u => (u.key, u.op)).toSet
      assert(ops.contains(("a", "delete")))
      assert(ops.contains(("b", "delete")))
      assert(!ops.contains(("c", "delete")))
    } finally q.stop()
  }

  test("windowedCounts aggregates per tumbling window with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = IncrementalStream
      .windowedCounts(events, "ts", "event_type", "value",
        "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wc_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        (ts("2026-01-01 00:01:00"), "click", 1.5),
        (ts("2026-01-01 00:04:00"), "click", 2.5),
        (ts("2026-01-01 00:11:00"), "view", 4.0))
      q.processAllAvailable()
      val got = spark.table("wc_out")
        .select($"event_type", $"cnt", $"sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got.contains(("click", 2L, 4.0)))
      assert(got.contains(("view", 1L, 4.0)))
    } finally q.stop()
  }

  test("readStream over the harness events parquet drives the window agg") {
    import spark.implicits._
    // file-source streaming: the same windowedCounts plan fed by
    // readStream over the sf0.001 events table. The raw parquet is read
    // here (readStream needs an explicit schema), so ts is normalized to
    // the engine's nanos clock the same way Tables.events does before
    // deriving the event-time column — including the LongType guard, so
    // a fixture regenerated in the legacy nanos-as-long layout passes
    // through instead of being misread as seconds.
    val schema = spark.read
      .option("pathGlobFilter", "events.parquet")
      .parquet("/root/testdata/sf0.001").schema
    val rawStream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet("/root/testdata/sf0.001")
    val stream = (schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => rawStream // legacy nanos
      case _ => rawStream.withColumn("ts", graft.Tables.eventTsNanos(
        org.apache.spark.sql.functions.col("ts")))
    })
      .withColumn("event_ts", org.apache.spark.sql.functions
        .to_timestamp(org.apache.spark.sql.functions.col("ts") / 1e9))
    val q = IncrementalStream
      .windowedCounts(stream, "event_ts", "event_type", "value",
        "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("fs_out")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("fs_out")
      assert(got.count() > 0)
      // totals across windows match the batch answer
      val streamTotal = got.agg(org.apache.spark.sql.functions.sum("cnt"))
        .head().getLong(0)
      assert(streamTotal === 1000L)
    } finally q.stop()
  }

  test("corpus-QC operators run unchanged on a stream (map-only = streamable)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the text-analysis family is pure column expressions, so the SAME
    // code drives batch and streaming: a quality-filter gate over a
    // document stream must admit exactly the rows its batch twin admits
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs on in a " +
        "long enough clean sentence " + ("word " * 20)),
      (2L, "#$%!!! @@@ ###"), // punctuation-heavy -> rejected
      (3L, "short"))          // too short -> rejected
    def gate(df: org.apache.spark.sql.DataFrame) = df.filter(
      graft.text.TextAnalysis.tokenCount($"text") >= 20 &&
        graft.text.TextAnalysis.punctRatio($"text") < 0.1 &&
        graft.text.TextAnalysis.stopwordRatio($"text") > 0.0)
    val input = MemoryStream[(Long, String)]
    val q = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qc_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("qc_stream")
        .select($"doc_id").as[Long].collect().sorted.toSeq
      val batch = gate(docs.toDF("doc_id", "text"))
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(streamed === batch)
      assert(streamed === Seq(1L))
    } finally q.stop()
  }

  test("dedupStream keeps first arrival per key; bounded state re-admits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = IncrementalStream.dedupStream(
      input.toDF().toDF("key", "ts"), Seq("key"), "ts",
      watermarkDelay = "2 minutes")
      .writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("a", ts("2026-01-01 00:00:00")),
        ("b", ts("2026-01-01 00:00:10")))
      q.processAllAvailable()
      // duplicates inside the watermark window are dropped
      input.addData(("a", ts("2026-01-01 00:00:30")),
        ("c", ts("2026-01-01 00:01:00")))
      q.processAllAvailable()
      val first = spark.table("dd_out").select($"key").as[String].collect()
      assert(first.sorted.toSeq === Seq("a", "b", "c"))
      assert(first.length === 3, "duplicate 'a' must be dropped")
      // advance event time far past a's state TTL, then re-send it:
      // bounded state re-admits — the documented watermark tradeoff
      input.addData(("d", ts("2026-01-01 00:30:00")))
      q.processAllAvailable()
      input.addData(("a", ts("2026-01-01 00:31:00")))
      q.processAllAvailable()
      val keys = spark.table("dd_out").select($"key").as[String].collect()
      assert(keys.count(_ == "a") === 2,
        "aged-out key must re-admit under bounded state")
    } finally q.stop()
  }

  test("incrementalDedupStream: history dups dropped map-only, stream " +
      "dups first-occurrence, novel docs pass — batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
    val batchDf = docs.filter(pmod($"doc_id", lit(3)) === 0)
      .select($"doc_id", $"text").orderBy($"doc_id")
    val idx = graft.dedup.BloomIndex.build(hist, "text",
      expectedItems = 2000, fpp = 0.001, k = 16, bands = 2)
    // stream the batch in id order with a synthetic arrival ts
    val rows = batchDf.collect().map(r =>
      (r.getLong(0), r.getString(1),
        ts("2026-01-01 00:00:00")))
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = IncrementalStream.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text", "ts"), idx,
      "doc_id", "text", "ts", watermarkDelay = "1 hour",
      bounded = false)
      .writeStream.format("memory").queryName("inc_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.toSeq)
      // a second arrival of the first kept doc, later: in-stream dup
      q.processAllAvailable()
      val keptBatch = graft.dedup.Dedup.exactDedup(
        graft.dedup.BloomIndex.classify(batchDf, idx, "text")
          .filter($"status" === "kept"), "doc_id", "text")
        .select($"doc_id").as[Long].collect().toSet
      val got = spark.table("inc_out").select($"doc_id")
        .as[Long].collect()
      assert(got.toSet === keptBatch)
      assert(got.length === got.toSet.size)
      assert(got.nonEmpty)
      // replaying an emitted doc under a fresh id: in-stream content
      // dup, must not re-emit
      val dupOf = got.min
      val text0 = batchDf.filter($"doc_id" === dupOf)
        .select($"text").as[String].head()
      input.addData(Seq((9999999L, text0, ts("2026-01-01 00:00:01"))))
      q.processAllAvailable()
      assert(spark.table("inc_out").count() === got.length.toLong)
    } finally q.stop()
  }

  test("dedupStream batch parity: streaming output keys = ev_dedup_first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed the sf0.001 events through the stream in event-time order so
    // first-arrival == min-ts: the streaming result must carry exactly
    // the batch query's (user_id) key set, one row each. Unbounded
    // (exact) form — the bounded form would age keys out between
    // batches (the events span ~60h vs any practical watermark) and
    // re-admit them, which is its documented semantics, not a bug.
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_ts", org.apache.spark.sql.functions
        .to_timestamp(org.apache.spark.sql.functions.col("ts") / 1e9))
      .select($"user_id", $"event_ts").orderBy($"event_ts")
      .as[(Long, Timestamp)].collect()
    val input = MemoryStream[(Long, Timestamp)]
    val q = IncrementalStream.dedupStream(
      input.toDF().toDF("user_id", "event_ts"), Seq("user_id"), "event_ts",
      watermarkDelay = "10 minutes", bounded = false)
      .writeStream.format("memory").queryName("ddp_out")
      .outputMode(OutputMode.Append()).start()
    try {
      ev.grouped(200).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val streamKeys = spark.table("ddp_out")
        .select($"user_id").as[Long].collect().sorted.toSeq
      val batchKeys = graft.SparkEntry
        .queries("ev_dedup_first")(spark, "/root/testdata/sf0.001")
        .select($"user_id").as[Long].collect().sorted.toSeq
      assert(streamKeys === batchKeys)
    } finally q.stop()
  }

  test("semanticDedupEachBatch parity: streaming statuses = batch " +
      "semanticStatus + semanticAppend loop") {
    semStreamParity(graft.dedup.Dedup.SemanticHierThreshold)
  }

  test("semanticDedupEachBatch parity holds over a TWO-LEVEL index " +
      "(forced hier build: own-cell probes + checkpointed codes)") {
    semStreamParity(0L)
  }

  private def semStreamParity(hierThreshold: Long): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val hist = docs.filter(pmod($"doc_id", lit(3)) =!= 0)
    val idx0 = graft.dedup.Dedup.semanticIndex(hist, "doc_id", "text",
      hierThreshold = hierThreshold)
    val inc1 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
        pmod($"doc_id", lit(2)) === 0).select($"doc_id", $"text")
    val inc2 = docs.filter(pmod($"doc_id", lit(3)) === 0 &&
        pmod($"doc_id", lit(2)) === 1).select($"doc_id", $"text")
      .unionByName(docs.filter(pmod($"doc_id", lit(3)) === 0 &&
          pmod($"doc_id", lit(2)) === 0 && pmod($"doc_id", lit(4)) === 0)
        .select(($"doc_id" + 200000L).as("doc_id"), $"text"))
    // batch reference: classify inc1, grow, classify inc2
    val b1 = graft.dedup.Dedup.semanticStatus(inc1, idx0, "doc_id", "text")
    val kept1 = b1.filter($"status" === "kept").select($"doc_id", $"text")
    val idx1 = graft.dedup.Dedup.semanticAppend(idx0, kept1, "doc_id", "text")
    val b2 = graft.dedup.Dedup.semanticStatus(inc2, idx1, "doc_id", "text")
    val batchRes = (b1.select($"doc_id", lit(0L).as("increment"), $"status")
      .unionByName(b2.select($"doc_id", lit(1L).as("increment"), $"status")))
      .collect().map(_.toSeq).toSet
    // streaming: same two increments as micro-batches
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_sem_stream_spec").toString
    val input = MemoryStream[(Long, String)]
    val q = IncrementalStream.semanticDedupEachBatch(
        input.toDF().toDF("doc_id", "text"), idx0, "doc_id", "text", outDir)
      .start()
    try {
      input.addData(inc1.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      input.addData(inc2.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    try {
      val streamRes = spark.read.parquet(s"$outDir/status")
        .select($"doc_id", $"increment", $"status")
        .collect().map(_.toSeq).toSet
      assert(streamRes === batchRes)
    } finally graft.Tables.deleteTree(java.nio.file.Paths.get(outDir))
  }

  test("semantic streaming compaction: statuses identical to the " +
      "uncompacted stream, tail bounded, crashed-fold debris excluded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val hist = docs.filter(pmod($"doc_id", lit(5)) === 0)
    val idx0 = graft.dedup.Dedup.semanticIndex(hist, "doc_id", "text")
    val incs = (1 to 4).map { i =>
      docs.filter(pmod($"doc_id", lit(5)) === i)
        .select($"doc_id", $"text").orderBy($"doc_id")
        .as[(Long, String)].collect().toSeq
    }
    def run(compactEvery: Int)
        : (String, Set[Seq[Any]], MemoryStream[(Long, String)]) = {
      val outDir = java.nio.file.Files
        .createTempDirectory(s"graft_sem_compact_$compactEvery").toString
      val input = MemoryStream[(Long, String)]
      // explicit checkpoint so the compacted query can be RESUMED below
      // (the deployment restart shape: same checkpoint, batch ids
      // continue past the folded watermark)
      val q = IncrementalStream.semanticDedupEachBatch(
          input.toDF().toDF("doc_id", "text"), idx0, "doc_id", "text",
          outDir, compactEvery = compactEvery)
        .option("checkpointLocation", s"$outDir/ckpt")
        .start()
      try {
        incs.foreach { rows => input.addData(rows); q.processAllAvailable() }
      } finally q.stop()
      val res = IncrementalStream.semanticDedupOutput(spark, outDir)
        .select($"doc_id", $"increment", $"status")
        .collect().map(_.toSeq).toSet
      (outDir, res, input)
    }
    val (plainDir, plain, _) = run(0)
    val (compDir, compacted, compIn) = run(2)
    try {
      assert(compacted === plain)
      // fold cadence at compactEvery=2 over 4 batches: fold at batch 2
      // (covers incs 0,1) — the live tail is incs 2,3 only
      val statusRoot = java.nio.file.Paths.get(compDir, "status")
      val tail = java.nio.file.Files.list(statusRoot).toArray.map(_.toString)
        .filter(_.contains("inc=")).sorted
      assert(tail.length === 2, s"tail not bounded: ${tail.mkString(",")}")
      val store = s"$compDir/indexstore"
      assert(graft.dedup.SemanticIndexIO.exists(spark, store))
      assert(graft.dedup.SemanticIndexIO.note(spark, store) === "1")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(compDir, "statuslog", "upto=1")))
      // a crashed fold's statuslog dir claims coverage PAST the
      // committed watermark — readers must exclude it
      val bogus = Seq((999999L, 9L, "BOGUS"))
        .toDF("doc_id", "increment", "status")
      bogus.write.parquet(s"$compDir/statuslog/upto=999")
      val after = IncrementalStream.semanticDedupOutput(spark, compDir)
        .select($"doc_id", $"increment", $"status")
        .collect().map(_.toSeq).toSet
      assert(after === plain, "crashed-fold debris leaked into the output")
      // r13 review finding #1: a stream RESTARTED over a folded dir
      // with compactEvery left at its default 0 must still consult the
      // store — re-crawls of folded-batch docs must read sem_hist, not
      // leak as kept because the gate read the compaction flag. The
      // restart is the real deployment shape: SAME checkpoint, so batch
      // ids continue past the folded watermark (inc=4 here).
      val folded = incs(0).filter(r => r._2 != null && r._2.nonEmpty)
        .take(3).map { case (id, t) => (id + 400000L, t) }
      val q3 = IncrementalStream.semanticDedupEachBatch(
          compIn.toDF().toDF("doc_id", "text"), idx0, "doc_id", "text",
          compDir)
        .option("checkpointLocation", s"$compDir/ckpt")
        .start()
      try { compIn.addData(folded); q3.processAllAvailable() }
      finally q3.stop()
      val re = spark.read.parquet(s"$compDir/status/inc=4")
        .select($"doc_id", $"status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      folded.foreach { case (id, _) =>
        assert(re(id) === "sem_hist",
          s"folded-history re-crawl $id leaked as '${re(id)}'")
      }
      // and the corruption shape the restart guard exists for: a FRESH
      // checkpoint over the same folded outDir restarts batch ids at 0,
      // at or below the covered watermark — ids the store already owns.
      // Writing would be silent data loss (invisible to readers,
      // deleted unarchived by the next fold) — the batch must refuse.
      val freshIn = MemoryStream[(Long, String)]
      val q4 = IncrementalStream.semanticDedupEachBatch(
          freshIn.toDF().toDF("doc_id", "text"), idx0, "doc_id", "text",
          compDir)
        .start()
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        try { freshIn.addData(folded); q4.processAllAvailable() }
        finally q4.stop()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
          Option(c.getMessage).exists(_.contains("folded watermark"))),
        s"fresh-checkpoint restart over a folded dir did not refuse: $ex")
      // same hazard, NEVER-FOLDED form (no store, covered=-1): existing
      // inc dirs numbered past the restarted batch can only be a dead
      // run's output — overwriting would silently interleave runs
      val freshIn2 = MemoryStream[(Long, String)]
      val q5 = IncrementalStream.semanticDedupEachBatch(
          freshIn2.toDF().toDF("doc_id", "text"), idx0, "doc_id", "text",
          plainDir)
        .start()
      val ex2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        try { freshIn2.addData(folded); q5.processAllAvailable() }
        finally q5.stop()
      }
      assert(causes(ex2).exists(c =>
          Option(c.getMessage).exists(_.contains("already holds inc="))),
        s"fresh restart over a never-folded dir did not refuse: $ex2")
    } finally {
      graft.Tables.deleteTree(java.nio.file.Paths.get(plainDir))
      graft.Tables.deleteTree(java.nio.file.Paths.get(compDir))
    }
  }

  test("driftCheckEvery: a drifted fold records drifted=true in " +
      "stats().drift while statuses stay identical to an unprobed " +
      "stream (r15)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val hist = graft.dedup.Dedup
      .semanticIndex(docs.filter(pmod($"doc_id", lit(5)) === 0),
        "doc_id", "text")
    // seven batches at compactEvery=2: folds fire at batch 2 (initial
    // save — unprobed by design), batch 4 (covers incs 2,3 — the FIRST
    // probed fold, records the baseline), and batch 6 (covers incs 4,5
    // — the DRIFTED fold: re-keyed token space). The probe must warn +
    // record, and must not move a single status byte.
    val incs: Seq[Seq[(Long, String)]] = (1 to 4).map { i =>
      docs.filter(pmod($"doc_id", lit(5)) === i)
        .select($"doc_id", $"text").orderBy($"doc_id")
        .as[(Long, String)].collect().toSeq
    } ++ Seq(4, 3).zipWithIndex.map { case (i, j) =>
      docs.filter(pmod($"doc_id", lit(5)) === i)
        .select(($"doc_id" + 700000L * (j + 1)).as("doc_id"),
          translate($"text", "aeiouAEIOU", "qxzvwQXZVW").as("text"))
        .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    } ++ Seq(docs.filter(pmod($"doc_id", lit(5)) === 2).limit(5)
      .select($"doc_id" + 900000L, $"text")
      .as[(Long, String)].collect().toSeq)
    def run(driftCheckEvery: Int): (String, Set[Seq[Any]]) = {
      val outDir = java.nio.file.Files
        .createTempDirectory(s"graft_sem_drift_$driftCheckEvery").toString
      val input = MemoryStream[(Long, String)]
      val q = IncrementalStream.semanticDedupEachBatch(
          input.toDF().toDF("doc_id", "text"), hist, "doc_id", "text",
          outDir, compactEvery = 2, driftCheckEvery = driftCheckEvery)
        .option("checkpointLocation", s"$outDir/ckpt")
        .start()
      try {
        incs.foreach { rows => input.addData(rows); q.processAllAvailable() }
      } finally q.stop()
      val res = IncrementalStream.semanticDedupOutput(spark, outDir)
        .select($"doc_id", $"increment", $"status")
        .collect().map(_.toSeq).toSet
      (outDir, res)
    }
    val (plainDir, plain) = run(0)
    val (probedDir, probed) = run(1)
    try {
      // the probe is observation-only: not one status moved
      assert(probed === plain)
      val store = s"$probedDir/indexstore"
      val st = graft.dedup.SemanticIndexIO.stats(spark, store)
      assert(st.drift.isDefined,
        "probed fold did not record a drift reading in the store")
      assert(st.drift.get.drifted,
        s"drifted fold read as in-distribution: ${st.drift}")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(probedDir, "indexstore",
          "_drift_baseline.txt")))
      // the unprobed stream recorded nothing
      val st0 = graft.dedup.SemanticIndexIO.stats(spark,
        s"$plainDir/indexstore")
      assert(st0.drift.isEmpty)
    } finally {
      graft.Tables.deleteTree(java.nio.file.Paths.get(plainDir))
      graft.Tables.deleteTree(java.nio.file.Paths.get(probedDir))
    }
  }

  test("sessionizeStream batch parity: sessions = Sessionize.byGap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapNs = 6L * 3600 * 1000000000L
    val dir = "/root/testdata/sf0.001"
    // feed the events in event-time order; a far-future sentinel (key
    // -1) then advances the watermark past every open session's timeout
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"ts").orderBy($"ts")
      .as[(Long, Long)].collect()
    def toSe(key: Long, tsNs: Long) = IncrementalStream.SessionEvent(
      key, tsNs, new Timestamp(tsNs / 1000000L))
    val input = MemoryStream[IncrementalStream.SessionEvent]
    val q = IncrementalStream
      .sessionizeStream(input.toDS(), gapNs, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      ev.grouped(250).foreach { chunk =>
        input.addData(chunk.map { case (k, t) => toSe(k, t) }.toSeq)
        q.processAllAvailable()
      }
      val far = ev.map(_._2).max + 1000L * gapNs
      // two sentinel batches: the first advances the watermark, the
      // second gives the engine a trigger at which timeouts fire
      input.addData(toSe(-1L, far)); q.processAllAvailable()
      input.addData(toSe(-1L, far + 1)); q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .filter($"key" >= 0)
        .select($"key", $"session_id", $"session_start", $"session_end",
          $"n_events")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = graft.operators.Sessionize.byGap(
        graft.Tables.events(spark, dir), "user_id", "ts", "event_id", gapNs)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("sessionizeStream parity under shuffled-within-delay arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // events arrive out of order by a bounded jitter (<= 20s), admitted
    // by a 30s watermark delay; displacement stays under the 100s gap,
    // so batch parity must hold exactly (the documented contract —
    // late same-session events widen [start, last] via min/max)
    val gapNs = 100L * 1000000000L
    val events = (for {
      k <- 1 to 12
      sess <- 0 until 4
      i <- 0 until (1 + (k + sess) % 4)
    } yield {
      // sessions >= ~960s apart; within-session spacing 10s < jitter
      // window so real reorderings occur both within and across batches
      val base = (sess * 1000L + k * 3L) * 1000000000L
      (k.toLong, base + i * 10L * 1000000000L)
    }).toVector
    def jit(k: Long, t: Long): Long =
      math.abs((k * 2654435761L + t) % 20000000000L)
    val arrival = events.sortBy { case (k, t) => t + jit(k, t) }
    assert(arrival != events.sortBy(_._2), "jitter must actually reorder")

    def toSe(key: Long, tsNs: Long) = IncrementalStream.SessionEvent(
      key, tsNs, new Timestamp(tsNs / 1000000L))
    val input = MemoryStream[IncrementalStream.SessionEvent]
    val q = IncrementalStream
      .sessionizeStream(input.toDS(), gapNs, watermarkDelay = "30 seconds")
      .writeStream.format("memory").queryName("sess_shuf_out")
      .outputMode(OutputMode.Append()).start()
    try {
      arrival.grouped(7).foreach { chunk =>
        input.addData(chunk.map { case (k, t) => toSe(k, t) })
        q.processAllAvailable()
      }
      val far = events.map(_._2).max + 1000L * gapNs
      input.addData(toSe(-1L, far)); q.processAllAvailable()
      input.addData(toSe(-1L, far + 1)); q.processAllAvailable()
      val streamed = spark.table("sess_shuf_out")
        .filter($"key" >= 0)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = graft.operators.Sessionize.byGap(
        events.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", gapNs)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("sessionizeStream displacement > gap: divergence bounded to the " +
      "absorbing session, one streamed-only session per displaced event run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The documented divergence contract (IncrementalStream scaladoc):
    // an event arriving more than `gap` before the open session's span
    // belongs to an earlier session in batch semantics, but streaming
    // absorbs it into the CURRENT open session (emitted sessions are
    // immutable). This case feeds exactly that shape and asserts the
    // bound: already-emitted sessions match batch verbatim, no event is
    // lost (n_events totals equal), and the only divergent rows are the
    // absorbing session (streamed side) vs the would-have-been sessions
    // (batch side) on the displaced key.
    val gapNs = 100L * 1000000000L
    val base = 1000000L * 1000000000L
    def sec(s: Long) = base + s * 1000000000L
    def toSe(key: Long, tsNs: Long) = IncrementalStream.SessionEvent(
      key, tsNs, new Timestamp(tsNs / 1000000L))
    val input = MemoryStream[IncrementalStream.SessionEvent]
    val q = IncrementalStream
      .sessionizeStream(input.toDS(), gapNs, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("sess_disp_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // session A in order, then session B opens (A emits, immutable)
      input.addData(Seq(toSe(1L, sec(0)), toSe(1L, sec(10)), toSe(1L, sec(20))))
      q.processAllAvailable()
      input.addData(Seq(toSe(1L, sec(1000)), toSe(1L, sec(1010))))
      q.processAllAvailable()
      // the beyond-gap displaced event: t=500s is 500s before B's span
      // (admitted — watermark is 2h behind), 480s after A closed; batch
      // gives it its own session, streaming must absorb it into B
      input.addData(toSe(1L, sec(500))); q.processAllAvailable()
      val far = sec(100000)
      input.addData(toSe(-1L, far)); q.processAllAvailable()
      input.addData(toSe(-1L, far + 1)); q.processAllAvailable()

      val streamed = spark.table("sess_disp_out").filter($"key" >= 0)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = graft.operators.Sessionize.byGap(
        Seq((1L, sec(0), 0L), (1L, sec(10), 1L), (1L, sec(20), 2L),
          (1L, sec(500), 3L), (1L, sec(1000), 4L), (1L, sec(1010), 5L))
          .toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", gapNs)
        .as[(Long, Long, Long, Long, Long)].collect().toSet

      val sessionA = (1L, 1L, sec(0), sec(20), 3L)
      assert(streamed.contains(sessionA) && batch.contains(sessionA),
        "the already-emitted session matches batch verbatim")
      // divergence bound: ONE streamed-only session (B absorbed the
      // displaced event, widening its start to the event) vs TWO
      // batch-only sessions (the displaced singleton + unwidened B)
      assert(streamed -- batch === Set((1L, 2L, sec(500), sec(1010), 3L)),
        s"streamed-only = the absorbing session; got ${streamed -- batch}")
      assert(batch -- streamed === Set(
        (1L, 2L, sec(500), sec(500), 1L), (1L, 3L, sec(1000), sec(1010), 2L)),
        s"batch-only = displaced singleton + unwidened session; got ${batch -- streamed}")
      // no event lost or duplicated on either side
      assert(streamed.toSeq.map(_._5).sum === batch.toSeq.map(_._5).sum)
    } finally q.stop()
  }

  test("sessionizeStream retainNumbering=false drops state at timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapNs = 60L * 1000000000L
    // events must sit ABOVE the initial zero watermark: a first event at
    // ts = 0 (the epoch) is filtered as late before the operator sees it
    val base = 1000000L * 1000000000L
    def toSe(key: Long, tsNs: Long) = IncrementalStream.SessionEvent(
      key, base + tsNs, new Timestamp((base + tsNs) / 1000000L))
    val input = MemoryStream[IncrementalStream.SessionEvent]
    val q = IncrementalStream
      .sessionizeStream(input.toDS(), gapNs, retainNumbering = false)
      .writeStream.format("memory").queryName("sess_renum_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(toSe(5L, 0L)); q.processAllAvailable()
      // watermark far past 0 + gap -> session times out, state removed
      input.addData(toSe(9L, 500L * 1000000000L)); q.processAllAvailable()
      input.addData(toSe(9L, 501L * 1000000000L)); q.processAllAvailable()
      // key 5 returns after its state was dropped: numbering restarts
      input.addData(toSe(5L, 600L * 1000000000L)); q.processAllAvailable()
      val far = 5000L * 1000000000L
      input.addData(toSe(-1L, far)); q.processAllAvailable()
      input.addData(toSe(-1L, far + 1)); q.processAllAvailable()
      val ids = spark.table("sess_renum_out").filter($"key" === 5L)
        .select($"session_id").as[Long].collect().toSeq.sorted
      assert(ids === Seq(1L, 1L),
        "without numbering retention both sessions number from 1; table: " +
          spark.table("sess_renum_out").collect().mkString("; "))
    } finally q.stop()
  }

  test("intervalJoinStream batch parity on the harness events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // clicks attributed to the views of the same user in the preceding
    // 6 hours — fed in event-time order so the inner join can emit and
    // age state as the watermark advances
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        timestamp_micros(expr("ts div 1000")).as("ets"))
      .orderBy($"ets")
      .as[(Long, Long, String, Timestamp)].collect()
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val joined = IncrementalStream.intervalJoinStream(
      clicks.toDF().toDF("c_user", "c_id", "c_ts"),
      views.toDF().toDF("v_user", "v_id", "v_ts"),
      "c_user", "v_user", "c_ts", "v_ts",
      lookback = "6 hours", watermarkDelay = "1 minute")
    val q = joined.select($"c_id", $"v_id")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append()).start()
    try {
      ev.grouped(300).foreach { chunk =>
        clicks.addData(chunk.collect {
          case (u, id, "click", t) => (u, id, t) }.toSeq)
        views.addData(chunk.collect {
          case (u, id, "view", t) => (u, id, t) }.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("ij_out")
        .as[(Long, Long)].collect().toSet
      val all = graft.Tables.events(spark, dir)
        .select($"user_id", $"event_id", $"event_type",
          timestamp_micros(expr("ts div 1000")).as("ets"))
      val batch = all.filter($"event_type" === "click")
        .toDF("c_user", "c_id", "c_type", "c_ts")
        .join(all.filter($"event_type" === "view")
          .toDF("v_user", "v_id", "v_type", "v_ts"),
          $"c_user" === $"v_user" &&
            $"v_ts" >= $"c_ts" - expr("INTERVAL 6 HOURS") &&
            $"v_ts" <= $"c_ts")
        .select($"c_id", $"v_id").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty) // non-vacuous on the committed table
    } finally q.stop()
  }

  test("mergeEachBatch applies the classify-merge per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val snap = s"$dir/snapshot"
    // seed an empty FULL_ANNOT snapshot
    graft.gaf.Fixtures.emptyFullAnnot(spark).write.parquet(snap)

    val cols = graft.gaf.Dims.fullAnnot.fieldNames
    val input = MemoryStream[(String, Int, String)]
    val incoming = input.toDF().toDF("term_acc", "annotated_object_rgd_id", "evidence")
      .withColumn("ref_rgd_id", lit(1))
      .withColumn("with_info", lit(null).cast("string"))
      .withColumn("qualifier", lit(null).cast("string"))
      .withColumn("xref_source", lit(null).cast("string"))
    val full = cols.foldLeft(incoming) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(graft.gaf.Dims.fullAnnot(c).dataType))
    }.select(cols.map(col): _*)

    val q = IncrementalStream.mergeEachBatch(full, snap,
      () => ts("2026-01-01 00:00:00"), createdBy = 190).start()
    try {
      input.addData(("GO:0001", 1001, "IDA"))
      q.processAllAvailable()
      // second micro-batch must accumulate on top of the first
      input.addData(("GO:0002", 1002, "IEA"))
      q.processAllAvailable()
      val merged = spark.read.parquet(
        IncrementalStream.latestSnapshotDir(spark, snap))
      assert(merged.count() === 2)
      assert(merged.select("term_acc").collect().map(_.getString(0)).toSet ===
        Set("GO:0001", "GO:0002"))
    } finally q.stop()
  }

  test("applyBatch replay (crash between parquet and checkpoint commit) is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val snap = s"$dir/snapshot"
    graft.gaf.Fixtures.emptyFullAnnot(spark).write.parquet(snap)

    val cols = graft.gaf.Dims.fullAnnot.fieldNames
    def batchDf(term: String) = {
      val base = Seq((term, 1001, "IDA"))
        .toDF("term_acc", "annotated_object_rgd_id", "evidence")
        .withColumn("ref_rgd_id", lit(1))
      cols.foldLeft(base) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(graft.gaf.Dims.fullAnnot(c).dataType))
      }.select(cols.map(col): _*).drop("full_annot_key", "created_date",
        "last_modified_date", "created_by", "last_modified_by")
    }

    val t0 = () => ts("2026-01-01 00:00:00")
    IncrementalStream.applyBatch(batchDf("GO:0001"), 0L, snap, t0, 190)
    val v0 = spark.read.parquet(s"${snap}_v0").collect().toSeq

    // replay of batch 0: _v0 is committed, so the batch must neither
    // overwrite-while-reading _v0 nor double-apply — exact no-op
    IncrementalStream.applyBatch(batchDf("GO:0009"), 0L, snap, t0, 190)
    assert(spark.read.parquet(s"${snap}_v0").collect().toSeq === v0)
    assert(IncrementalStream.latestSnapshotDir(spark, snap) === s"${snap}_v0")

    // next batch still applies on top
    IncrementalStream.applyBatch(batchDf("GO:0002"), 1L, snap, t0, 190)
    val v1 = spark.read.parquet(s"${snap}_v1")
    assert(v1.count() === 2)
  }
}
