package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's incremental
  * touch-else-expire protocol (U3/U4: rows are kept alive by being
  * re-seen; rows unseen past a cutoff are deleted — SURVEY.md §2.7).
  * The batch pipeline implements it as a MERGE; here the same semantics
  * run continuously over an event stream with keyed state.
  *
  * Scale: state is partitioned by key across executors (the stream
  * shuffle), one small record per live key, aged out by processing-time
  * timeout — the streaming analog of the stale-delete cutoff.
  */
object IncrementalStream {

  final case class KeyEvent(key: String, ts: Timestamp)
  final case class KeyState(firstSeen: Long, lastSeen: Long, hits: Long)
  final case class KeyUpdate(key: String, op: String, hits: Long)

  /** flatMapGroupsWithState touch/expire: first event per key emits
    * `insert`, subsequent ones `touch`; a key unseen once the event-time
    * watermark passes lastSeen + idleMs expires and emits `delete` —
    * exactly U1/U3/U4's lifecycle, continuously. Event-time timeouts
    * (not processing-time) keep expiry deterministic and replayable, the
    * streaming analog of the batch stale-cutoff timestamp; they also
    * avoid the tight empty-batch loop processing-time timeouts force on
    * the micro-batch engine.
    */
  def touchExpire(events: Dataset[KeyEvent], idleMs: Long,
                  watermarkDelay: String = "0 seconds"): Dataset[KeyUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, KeyUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            val hits = state.getOption.map(_.hits).getOrElse(0L)
            state.remove()
            Iterator(KeyUpdate(key, "delete", hits))
          } else {
            val evs = it.toSeq
            val now = evs.map(_.ts.getTime).max
            val prev = state.getOption
            val next = prev match {
              case Some(s) => s.copy(lastSeen = math.max(s.lastSeen, now),
                hits = s.hits + evs.size)
              case None => KeyState(now, now, evs.size)
            }
            state.update(next)
            state.setTimeoutTimestamp(next.lastSeen + idleMs)
            Iterator(KeyUpdate(key, if (prev.isEmpty) "insert" else "touch",
              next.hits))
          }
      }
  }

  /** Watermarked windowed aggregation over the events stream: per-type
    * counts + value sums in tumbling windows, late data dropped past the
    * watermark.
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     valueCol: String, window: String,
                     watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(typeCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(20,6)")).cast("double").as("sum_value"))

  final case class SessionEvent(key: Long, tsNs: Long, ts: Timestamp)
  final case class SessionState(nextId: Long, start: Long, last: Long, n: Long)
  final case class SessionOut(key: Long, session_id: Long,
                              session_start: Long, session_end: Long,
                              n_events: Long)

  /** Streaming gap sessionization — the continuous form of
    * [[graft.operators.Sessionize.byGap]], same output schema and same
    * session numbering (a key's sessions count from 1 in time order).
    * Sessions close either when a later event reveals a gap > gapNs
    * (emitted immediately) or when the event-time watermark passes
    * last + gap (event-time timeout — deterministic and replayable,
    * like touchExpire). State per key is one open session + a counter,
    * partitioned by key across executors; batch parity is asserted in
    * StreamingSpec.
    *
    * Late events (admitted by a nonzero watermarkDelay): an event older
    * than the open session is absorbed into it, widening BOTH bounds
    * (start takes math.min, last math.max). EXACT batch parity holds
    * when events arrive in time order per key (or watermarkDelay = 0),
    * and more generally whenever arrival displacement stays under the
    * gap: an event arriving more than `gap` before the open session's
    * span belongs to an EARLIER (possibly already-emitted) session in
    * batch semantics, but streaming absorbs it into the current one —
    * emitted sessions are immutable. StreamingSpec exercises both the
    * shuffled-within-delay (exact parity) case and the beyond-gap
    * displacement case, where the divergence is pinned exactly: one
    * streamed-only absorbing session vs the batch-side sessions it
    * merged, with already-emitted sessions and event totals identical.
    *
    * State cost: with `retainNumbering = true` (the default, needed for
    * batch-identical session_id), every key that ever times out leaves
    * a permanent zero-width record carrying its session counter — state
    * grows with DISTINCT KEY cardinality forever, not with event volume.
    * That is the honest price of stable numbering over an unbounded
    * stream; for unbounded key domains pass `retainNumbering = false`,
    * which removes state entirely at timeout (bounded state, but a
    * key's numbering restarts at 1 after each idle period).
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapNs: Long,
                       watermarkDelay: String = "0 seconds",
                       retainNumbering: Boolean = true)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            // with retainNumbering the counter survives in a fresh
            // zero-width state record so a later event continues the
            // numbering; it carries no open session (n = 0) and no
            // timeout, so it is inert until then (see scaladoc: this is
            // the per-distinct-key-forever state mode)
            if (retainNumbering)
              state.update(SessionState(s.nextId + 1, 0L, 0L, 0L))
            Iterator(SessionOut(key, s.nextId, s.start, s.last, s.n))
          } else {
            val evs = it.map(_.tsNs).toArray.sorted
            val init = state.getOption.getOrElse(SessionState(1L, 0L, 0L, 0L))
            val closed = Vector.newBuilder[SessionOut]
            var cur = init
            evs.foreach { t =>
              cur = if (cur.n == 0L) cur.copy(start = t, last = t, n = 1L)
              else if (t - cur.last > gapNs) {
                closed += SessionOut(key, cur.nextId, cur.start, cur.last, cur.n)
                SessionState(cur.nextId + 1, t, t, 1L)
              } else cur.copy(start = math.min(cur.start, t),
                last = math.max(cur.last, t), n = cur.n + 1L)
            }
            state.update(cur)
            if (cur.n > 0L)
              // round the ns deadline UP to whole ms: truncation would
              // let the timeout fire up to ~2ms before last + gap, and
              // an event landing in that sliver would start a spurious
              // new session
              state.setTimeoutTimestamp(math.max(
                (cur.last + gapNs + 999999L) / 1000000L,
                state.getCurrentWatermarkMs() + 1L))
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup — first occurrence per key wins, the
    * continuous form of the corpus exact-dedup operator (an ingest
    * pipeline dedups each crawl batch against everything already seen).
    * Composes builtins, no custom state function needed:
    *
    *  - `bounded = true` (the 100 TB shape):
    *    `dropDuplicatesWithinWatermark` — keyed state is dropped once
    *    the event-time watermark passes it, so state is proportional to
    *    the watermark window, not corpus history. A duplicate arriving
    *    AFTER its original aged out re-emits: the documented tradeoff of
    *    every bounded streaming dedup.
    *  - `bounded = false`: exact `dropDuplicates` — state grows with
    *    distinct keys forever; only for bounded key domains. NO
    *    watermark is applied on this branch (`watermarkDelay` is
    *    ignored): a watermarked ts column would make the dedup operator
    *    drop late-arriving rows entirely, so a key whose only
    *    occurrence arrives late would silently never be emitted —
    *    breaking the exactness the branch exists for.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermarkDelay: String, bounded: Boolean = true): DataFrame =
    if (bounded)
      events.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Streaming incremental-crawl dedup — the continuous form of
    * [[graft.dedup.Dedup.incrementalStatus]] + exact dedup: every
    * arriving document is classified against the BROADCAST Bloom
    * history index ([[graft.dedup.BloomIndex.classify]] is a pure
    * projection, so it composes onto a stream with zero state and zero
    * shuffle — the whole history lookup costs two filter probes per
    * row), survivors dedup WITHIN the stream by content fingerprint
    * ([[dedupStream]]'s bounded watermark state). History text is never
    * read; between increments a deployment folds the emitted docs' keys
    * into the filters ([[graft.dedup.BloomIndex.fold]]) and persists
    * the result ([[graft.dedup.BloomIndexIO]]) so the next stream run
    * sees them as history — the exact-keys batch analog is
    * [[graft.dedup.DedupIndexIO.append]].
    */
  def incrementalDedupStream(docs: DataFrame,
                             index: graft.dedup.BloomIndex.Index,
                             idCol: String, textCol: String, tsCol: String,
                             watermarkDelay: String,
                             bounded: Boolean = true): DataFrame =
    dedupStream(
      graft.dedup.BloomIndex.classify(docs, index, textCol)
        .filter(col("status") === "kept")
        .withColumn("_fp",
          graft.text.TextAnalysis.fingerprint(col(textCol))),
      Seq("_fp"), tsCol, watermarkDelay, bounded)
      .drop("_fp", "status")

  /** Watermarked stream-stream interval join: each left event
    * inner-joined to right events with the matching key whose timestamp
    * lies in `[leftTs - lookback, leftTs]` — the continuous form of the
    * batch temporal joins (AsOfJoin / RangeJoin) for two LIVE streams,
    * e.g. attributing each click to the views that preceded it.
    *
    * Both sides carry watermarks and the join condition includes the
    * time range, which is what lets Spark BOUND the join state: buffered
    * right rows age out once the watermark passes `rightTs + lookback`,
    * left rows as soon as the watermark passes `leftTs`. A stream-stream
    * join without the range condition keeps both sides' state forever —
    * the unbounded-state mistake this helper exists to prevent.
    *
    * Column names must be distinct across the two sides (rename before
    * calling, as with any self-join) so the output schema is unambiguous.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTs: String, rightTs: String,
                         lookback: String,
                         watermarkDelay: String = "0 seconds"): DataFrame =
    left.withWatermark(leftTs, watermarkDelay)
      .join(right.withWatermark(rightTs, watermarkDelay),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
          col(rightTs) <= col(leftTs))

  /** foreachBatch incremental MERGE: applies the batch classify-merge
    * (graft.operators.MergeSink) to each micro-batch against a parquet
    * snapshot — the streaming deployment shape of the reference's daily
    * batch. Snapshots are versioned per batch (`_v<batchId>`) and each
    * batch reads the LATEST version, so merges accumulate across batches
    * (a parquet dir can't be overwritten while being read); compaction
    * of old versions is the deployment's retention policy.
    */
  /** Committed (`_SUCCESS`-bearing) snapshot versions, newest first. */
  private def committedVersions(spark: org.apache.spark.sql.SparkSession,
                                snapshotDir: String): Seq[(Long, String)] = {
    val base = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = base.getParent
    val prefix = base.getName + "_v"
    val versions =
      if (fs.exists(parent))
        fs.listStatus(parent).map(_.getPath.getName)
          .filter(_.startsWith(prefix))
          .flatMap(n => n.stripPrefix(prefix).toLongOption.map(_ -> n))
      else Array.empty[(Long, String)]
    // only COMMITTED versions count: a crash mid-write leaves a _vN dir
    // without _SUCCESS, which must not poison the read path — fall back
    // through older committed versions to the seed snapshot
    versions.sortBy(-_._1).toIndexedSeq.collect {
      case (v, n)
          if fs.exists(new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(parent, n), "_SUCCESS")) =>
        v -> new org.apache.hadoop.fs.Path(parent, n).toString
    }
  }

  def latestSnapshotDir(spark: org.apache.spark.sql.SparkSession,
                        snapshotDir: String): String =
    committedVersions(spark, snapshotDir).headOption.map(_._2)
      .getOrElse(snapshotDir)

  /** One micro-batch of the incremental MERGE.
    *
    * Replay guard: after a crash BETWEEN the parquet commit and the
    * streaming-checkpoint commit, the batch re-runs with a version
    * >= batchId already on disk. Re-merging would read _v<batchId> and
    * mode("overwrite") the SAME directory (Spark deletes the target
    * before the read job runs — destroying the snapshot), or
    * double-apply the batch onto a newer version. The batch's effects
    * are already durable, so it is a no-op; reads otherwise come only
    * from versions strictly OLDER than this batch.
    */
  private[streaming] def applyBatch(batch: DataFrame, batchId: Long,
                                    snapshotDir: String, runTs: () => Timestamp,
                                    createdBy: Int): Unit = {
    val spark = batch.sparkSession
    val committed = committedVersions(spark, snapshotDir)
    if (!committed.exists(_._1 >= batchId)) {
      val source = committed.collectFirst {
        case (v, dir) if v < batchId => dir
      }.getOrElse(snapshotDir)
      val existing = spark.read.parquet(source)
      val merged = graft.operators.MergeSink
        .merge(existing, batch, runTs(), createdBy)
        .drop("_op")
      merged.write.mode("overwrite")
        .parquet(s"${snapshotDir}_v$batchId")
    }
  }

  /** Deterministic replay harness for the foreachBatch MERGE: applies
    * each (batchId, batch) in order through the SAME body
    * [[applyBatch]] the streaming sink runs, including the crash-replay
    * guard (a repeated batchId must be a no-op — pass one twice to
    * exercise it). Returns the latest committed snapshot directory.
    * This is exactly what the micro-batch engine does when a restart
    * re-delivers batches from the checkpoint, minus the trigger loop —
    * the harness form that lets the driver correctness-check the sink
    * per round (`ev_merge_replay`).
    */
  def replayMerge(batches: Seq[(Long, DataFrame)], snapshotDir: String,
                  runTs: () => Timestamp, createdBy: Int): String = {
    batches.foreach { case (id, b) =>
      applyBatch(b, id, snapshotDir, runTs, createdBy)
    }
    latestSnapshotDir(batches.head._2.sparkSession, snapshotDir)
  }

  def mergeEachBatch(incoming: DataFrame, snapshotDir: String,
                     runTs: () => Timestamp, createdBy: Int)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    incoming.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, snapshotDir, runTs, createdBy)
      }
  }

  /** Streaming SEMANTIC crawl dedup — the micro-batch form of
    * [[graft.dedup.Dedup.semanticStatus]] + [[graft.dedup.Dedup.semanticAppend]].
    * The ranker's per-query window cannot run on an unbounded stream,
    * so each micro-batch classifies as a BATCH plan against the current
    * index (foreachBatch — the same boundary [[mergeEachBatch]] uses
    * for the MERGE sink), writes ONE parquet per batch to
    * `<outDir>/status/inc=<batchId>` — every doc's status row, with the
    * doc text carried on KEPT rows only (the kept corpus IS the
    * deployment's output; dup rows store a null text) AND, also on kept
    * rows only, the doc's ENCODED index entry (cent_id, c_code, c_vec,
    * c_xsqn — [[graft.dedup.Dedup.semanticEncode]]'s columns): the
    * per-batch checkpoint of the grown code table. The next batch's
    * index derives by UNIONING those durable code rows
    * ([[graft.dedup.Dedup.semanticAppendEncoded]]) — map-only reads, no
    * re-embedding of prior kept text, so per-batch index-derivation
    * cost is linear in index SIZE, not quadratic in batch count (the
    * r11 form re-embedded and re-encoded every prior batch's kept docs
    * on each new batch — O(B²) over the stream's lifetime).
    *
    * Durability contract unchanged: the grown index derives from
    * index0 + the WRITTEN outputs of every batch id < this one, never
    * from in-memory state — a restarted query resumes at batch N
    * without replaying 0..N-1, and a RETRIED batch re-derives exactly
    * the same index (its own half-written dir is excluded by the
    * id < batchId bound, then overwritten), the same repeated-batchId
    * idempotence applyBatch's MERGE sink has. The caller's `index0` is
    * never mutated; within-batch near-dups are the batch ops' job, as
    * with every increment leg.
    */
  /** The stream's cumulative status/kept-corpus output: the compacted
    * `statuslog/upto=*` archives (bounded by the committed store's
    * covered watermark — a wider `upto` is a crashed fold's debris and
    * is excluded) unioned with the live `status/inc=*` tail. With
    * compaction off this is simply every inc dir. Readers use this
    * instead of globbing the dirs so compaction stays invisible to
    * them.
    */
  def semanticDedupOutput(spark: org.apache.spark.sql.SparkSession,
                          outDir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val storeDir = s"$outDir/indexstore"
    val covered =
      graft.dedup.SemanticIndexIO.coveredWatermark(spark, storeDir)
    def subdirs(root: String, prefix: String): Seq[(Long, String)] = {
      val r = new org.apache.hadoop.fs.Path(root)
      if (!fs.exists(r)) Seq.empty
      else fs.listStatus(r).toSeq.map(_.getPath)
        .flatMap { p =>
          p.getName.stripPrefix(prefix) match {
            case rest if p.getName.startsWith(prefix) =>
              rest.toLongOption.map(_ -> p.toString)
            case _ => None
          }
        }
    }
    val logs = subdirs(s"$outDir/statuslog", "upto=")
      .filter(_._1 <= covered).map(_._2)
    val tail = subdirs(s"$outDir/status", "inc=")
      .filter(_._1 > covered).map(_._2)
    val dirs = (logs ++ tail).sorted
    require(dirs.nonEmpty, s"no semantic dedup output under $outDir")
    // one multi-root scan (shared schema by construction), not N scans
    spark.read.parquet(dirs: _*)
  }

  /** `driftCheckEvery` (r15, opt-in): at every Nth FOLD (the
    * compactEvery cadence is where increments meet the store), the
    * folded increment is drift-probed through
    * [[graft.dedup.SemanticIndexIO.appendSave]]'s driftProbe — the
    * first probed fold records the store's baseline, later ones WARN
    * loudly through the logger when the quantizer-drift thresholds are
    * crossed and surface the reading in `stats().drift`, while
    * classification output stays byte-identical (rebuild is an
    * operator decision). 0 (default) = off; 1 = probe every fold.
    * Requires compactEvery > 0 (no folds, nowhere to probe).
    */
  def semanticDedupEachBatch(incoming: DataFrame,
                             index0: graft.dedup.Dedup.SemanticIndex,
                             idCol: String, textCol: String, outDir: String,
                             threshold: Double = 0.995,
                             nProbe: Int = 3, rFactor: Int = 20,
                             broadcastProbes: Boolean = true,
                             compactEvery: Int = 0,
                             driftCheckEvery: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    incoming.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val statusRoot = new org.apache.hadoop.fs.Path(s"$outDir/status")
        val fs = statusRoot.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val storeDir = s"$outDir/indexstore"
        // the committed store covers incs <= covered (its generation
        // note — committed ATOMICALLY with the code rows it describes).
        // Consulted UNCONDITIONALLY: a stream restarted with a different
        // compactEvery (including 0) must still classify against the
        // folded history — the store's existence, not the compaction
        // flag, decides (r13 review finding #1)
        var covered =
          graft.dedup.SemanticIndexIO.coveredWatermark(spark, storeDir)
        // A batch id AT OR BELOW the folded watermark means the query
        // restarted with a FRESH checkpoint over an outDir that already
        // carries folded history (checkpointed restarts resume at the
        // next id; retries re-run an id > covered — the fold never
        // covers its own batch). Writing would be silent corruption:
        // inc dirs numbered <= covered are invisible to readers and to
        // later batches' index derivation, and the next fold DELETES
        // them unarchived. Fail loudly instead (r13 review finding).
        require(batchId > covered,
          s"batch $batchId is not past the folded watermark $covered of " +
            s"$storeDir — this stream restarted with a fresh checkpoint " +
            "over an outDir carrying folded history; resume from the " +
            "original checkpoint or use a new outDir")
        // ONE status listing per batch, every derived view filters it
        val allIncs: Array[(Long, org.apache.hadoop.fs.Path)] =
          if (!fs.exists(statusRoot)) Array.empty
          else fs.listStatus(statusRoot).map(_.getPath)
            .flatMap { p =>
              val n = p.getName
              if (!n.startsWith("inc=")) None
              else n.drop(4).toLongOption.map(_ -> p)
            }.sortBy(_._1)
        // the never-folded form of the same restart hazard: inc dirs
        // NUMBERED PAST this batch can only come from a previous run
        // of the stream (a retry sees at most its own id; batch ids are
        // sequential within a run) — writing would silently overwrite
        // and interleave the dead run's output. A folded store makes
        // the earlier require fire first; this one covers covered=-1.
        allIncs.lastOption.foreach { case (maxId, _) =>
          require(maxId <= batchId,
            s"batch $batchId but $statusRoot already holds inc=$maxId — " +
              "this stream restarted with a fresh checkpoint over an " +
              "outDir carrying a previous run's output; resume from the " +
              "original checkpoint or use a new outDir")
        }
        def encodedOf(df: DataFrame): DataFrame = df
          // kept rows carry their encoded entry; cent_id is null on
          // dup rows and on kept-but-empty-text docs (excluded from
          // the index by semanticEncode's zero-vector filter)
          .filter(col("cent_id").isNotNull)
          .select(col(idCol).as("c_id"), col("cent_id"),
            col("c_code"), col("c_vec"), col("c_xsqn"))
        // FOLD at batch start once the tail is compactEvery dirs long:
        // archive the tail's status rows as ONE statuslog dir, commit
        // the tail's code rows into the generational store (the atomic
        // flip carries the new covered bound), then delete the folded
        // inc dirs — per-batch derivation and output listing stay
        // bounded by compactEvery instead of growing with stream life.
        // Crash-safe by the store's commit protocol: a fold that dies
        // before the flip leaves the store on the old bound (its
        // statuslog dir is debris — excluded by readers, overwritten or
        // swept on refold); one that dies after the flip leaves stale
        // inc dirs <= covered, deleted on the next fold pass.
        val tail0 = allIncs.filter { case (id, _) =>
          id > covered && id < batchId }
        var folded = false
        if (compactEvery > 0 && tail0.length >= compactEvery) {
          val upTo = tail0.map(_._1).max
          // refold debris: statuslog dirs claiming coverage past the
          // committed bound are crashed folds
          val logRoot = new org.apache.hadoop.fs.Path(s"$outDir/statuslog")
          if (fs.exists(logRoot)) fs.listStatus(logRoot).foreach { st =>
            val up = st.getPath.getName.stripPrefix("upto=").toLongOption
            if (up.exists(_ > covered)) fs.delete(st.getPath, true)
          }
          // this fold's ordinal = archived folds + 1 (statuslog dirs are
          // the fold archive; debris past `covered` was just deleted) —
          // drives the opt-in driftCheckEvery cadence below
          val foldOrdinal = 1 + (if (!fs.exists(logRoot)) 0
            else fs.listStatus(logRoot)
              .count(_.getPath.getName.startsWith("upto=")))
          val rows = spark.read
            .parquet(tail0.map(_._2.toString): _*).persist()
          try {
            rows.write.mode("overwrite")
              .parquet(s"$outDir/statuslog/upto=$upTo")
            if (covered < 0)
              graft.dedup.SemanticIndexIO.save(
                graft.dedup.Dedup.semanticAppendEncoded(index0,
                  encodedOf(rows)),
                storeDir, note = upTo.toString)
            else
              graft.dedup.SemanticIndexIO.appendSave(spark, storeDir,
                encodedOf(rows), note = upTo.toString,
                driftProbe = driftCheckEvery > 0 &&
                  foldOrdinal % driftCheckEvery == 0)
          } finally rows.unpersist()
          // the store gains one fragment per fold; fold the FRAGMENTS
          // too once they pile up (parquet-to-parquet, watermark
          // preserved) so a years-long stream's per-batch load unions a
          // bounded fragment list
          if (graft.dedup.SemanticIndexIO
              .fragmentCount(spark, storeDir) > 16)
            graft.dedup.SemanticIndexIO.compact(spark, storeDir)
          covered = upTo
          folded = true
          // the folded incs (and any stale ones a crashed fold left)
          // are now duplicated by the store + statuslog — delete
          allIncs.foreach { case (id, p) =>
            if (id <= covered) fs.delete(p, true)
          }
        }
        val base =
          if (covered >= 0)
            graft.dedup.SemanticIndexIO.load(spark, storeDir)
          else index0
        // a fold empties the tail by construction (it archives every
        // inc < batchId and advances `covered` to their max); without
        // one, tail0 is still the dir set — no second LIST per batch
        val priorDirs =
          if (folded) Array.empty[String] else tail0.map(_._2.toString)
        val idx =
          if (priorDirs.isEmpty) base
          else graft.dedup.Dedup.semanticAppendEncoded(base,
            encodedOf(spark.read.parquet(priorDirs: _*)))
        // status consumed twice (the write's left side + the kept slice
        // the encode reads) — persist so classify runs once per batch
        val status = graft.dedup.Dedup.semanticStatus(
            batch, idx, idCol, textCol, threshold,
            nProbe = nProbe, rFactor = rFactor,
            broadcastProbes = broadcastProbes)
          .select(col(idCol), lit(batchId).as("increment"), col("status"),
            col("match_id"), col("best_sim"),
            // kept corpus rides the same file: ONE write job per batch
            // (the second job was ~1/3 of the row's fixed cost)
            when(col("status") === "kept", col(textCol)).as(textCol))
          .persist()
        try {
          val codes = graft.dedup.Dedup.semanticEncode(index0,
              status.filter(col("status") === "kept")
                .select(col(idCol), col(textCol)),
              idCol, textCol)
            .withColumnRenamed("c_id", idCol)
          status.join(codes, Seq(idCol), "left")
            .write.mode("overwrite").parquet(s"$outDir/status/inc=$batchId")
        } finally status.unpersist()
      }
  }
}
