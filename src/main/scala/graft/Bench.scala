package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Benchmark main (driver contract): times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A warmup action runs first so the first timed query doesn't absorb
  * JVM/codegen/parquet-footer warmup; queries run in sorted name order
  * for stable attribution.
  *
  * Measurement hygiene (round-4 postmortem + round-6 verdict item 1 —
  * BASELINE.md):
  *
  *   - The timed action is a full-row digest,
  *     `agg(bit_xor(xxhash64(struct(cols*)))).head()`, NOT `count()`: count
  *     lets Catalyst prune payload columns and with them entire joins /
  *     windows (an as-of join "ran" in 0.6 s for ~3 s of real work), so
  *     every timed plan now executes its complete operator graph. Queries
  *     whose output types xxhash64 can't hash fall back to `foreach`,
  *     which also materializes every column. NOTE: totals are therefore
  *     not directly comparable to rounds ≤4, which timed `count()`.
  *   - The host CPU-throttles sporadically (observed: identical work
  *     swinging 4 s <-> 248 s with idle-CPU symptoms). The JSON line
  *     carries spin-calibration and /proc/loadavg fields so a reader can
  *     tell "engine regressed" from "host was sick": quiet baselines are
  *     calib_1t ~0.1 s and calib_32t ~0.25 s. If any calibration around
  *     a timed pass exceeds ~2x those, the whole pass re-runs once and
  *     the faster pass is reported, with "throttled" set from the
  *     calibrations around the pass that was kept.
  *   - QUIET-START gate (round 13): before the warm pass, while the
  *     spin calibration or the 1-min loadavg reads contended, sleep and
  *     re-probe (bounded at 10 min, then proceed regardless). The r12
  *     driver artifact started at loadavg 5.78: its warm pass — every
  *     row's guard baseline — absorbed the contention, inflating one
  *     committed row 14x while blinding the warm-relative guard. No
  *     in-pass machinery can repair a contaminated baseline; the only
  *     fix is to not start yet. "quiet_wait_sec" in the JSON shows the
  *     self-delay.
  *   - MID-PASS contention arrival (round 14): every timed attempt is
  *     stamped with the average FOREIGN CPU cores burned during its
  *     window (`/proc/stat` busy minus `/proc/self/stat`) — the one
  *     mid-pass discriminator our own local[32] work cannot pollute
  *     (raw loadavg reads 4-19 during a clean pass from self-load
  *     alone). At end of pass, every successful non-trivial row whose
  *     kept window exceeded FgnCoresMax foreign cores is re-rolled
  *     after a bounded wait for the foreign load to drain:
  *     keep-faster, traced in "reroll_trace", re-stamped; a row that
  *     could not be adjudicated in a quiet window stays suspect. This
  *     closes the r13 hole where contention arriving AFTER the quiet
  *     start inflated tail rows 2-6x while the warm-relative guard
  *     (warm and timed sharing the weather) stayed silent. The detail
  *     JSON carries per-row "fgn_queries" / "la_queries" maps.
  *   - BANDWIDTH-CLASS contention (round 15): the foreign-core stamp is
  *     blind to contention that burns no guest-visible CPU — the r14
  *     driver artifact carried rows 2-5x inflated with fgn = 0.0 (the
  *     host delivers less effective CPU/bandwidth with nothing foreign
  *     in /proc/stat — hypervisor co-tenancy). Two additional ABSOLUTE
  *     loudness triggers select rows for the end-of-pass re-roll, both
  *     judged against a SESSION FLOOR (running min over every same-kind
  *     probe this run takes) rather than fixed constants: the kept
  *     window's worst spin bracket, and the worst reading of a new
  *     memory-STREAMING probe (memSpin — a register spin cannot see
  *     pure bandwidth co-tenancy; a cache-line-stride stream can). Big
  *     rows are bracketed with both probes (pre+post); the re-roll
  *     confirm rule requires the re-roll window quiet by EVERY trigger
  *     before a no-faster re-roll may confirm the original (two loud
  *     windows are two bad measurements, not an adjudication). The JSON
  *     carries "cmax_queries"/"mmax_queries", the floors, and a
  *     "pairing_band_ok" self-check of the same-session pairing against
  *     the committed clean band (BASELINE.md).
  *   - PER-QUERY trust guard (round 7): the whole-pass brackets above
  *     cannot see a MID-pass contention episode (round-6's driver
  *     artifact carried unflagged 16x outliers with nominal brackets).
  *     The warm pass now records each query's warm time; in the timed
  *     pass any query whose time exceeds 3x its own warm time (and
  *     ~0.3 s absolute) triggers an on-demand spin calibration, ONE
  *     retry, and another calibration — the faster attempt is kept, the
  *     calibration trace is emitted in the JSON, and the query is
  *     flagged "suspect" if it STAYS >3x warm while a surrounding spin
  *     was elevated. A contended host now shows up as per-query suspect
  *     flags + a trace instead of silently inflated numbers. Round 11
  *     tightens the guard to 1.5x for rows with warm >= 2 s (the stable
  *     end of the surface, where 1.5x over warm is already weather) and
  *     brackets each with a pre-row spin recorded as "calib0" in the
  *     trace — the r10 driver artifact carried an 8.6x-inflated big row
  *     under nominal whole-pass brackets with the 3x guard silent.
  *   - SAME-SESSION DuckDB wall (round 7): immediately after the timed
  *     pass, the oracle SQL set runs in DuckDB on this host (shell-out
  *     to python3+duckdb, skipped gracefully when absent) so the JSON
  *     carries a (spark_oracle_subset, duckdb_wall) pair measured under
  *     identical host weather — the 2x harness gate stops comparing
  *     against a cross-round quiet-host memory.
  *   - A query that THROWS in the timed pass reports its elapsed time
  *     negated and is listed in "failed"; the printed total sums only
  *     successful queries, so breakage can't read as speedup.
  *   - As of round 6 the two ops dumps (`a7_counter_dump`,
  *     `ev_merge_replay`) are on the timed surface (run last in each
  *     pass to keep the replay's parquet writeback away from neighboring
  *     timings) — totals gain their ~real cost vs round 5's 94-query
  *     surface.
  */
object Bench {
  /** Un-eliminable fixed-work spin; wall seconds it takes are a direct
    * read of how much CPU the host is actually granting (quiet ~0.1 s).
    */
  private def spin(): Double = {
    val t0 = System.nanoTime(); var x = 0L; var i = 0
    while (i < 300000000) { x += i; i += 1 }
    if (x == 42L) println("?") // keep the loop un-eliminable
    (System.nanoTime() - t0) / 1e9
  }

  /** (single-thread, 32-thread) spin wall times. The 32x form catches
    * throttling that only bites under full-width load.
    */
  private def calibrate(): (Double, Double) = {
    val one = spin()
    val t0 = System.nanoTime()
    val ts = (1 to 32).map(_ => new Thread(() => spin()))
    ts.foreach(_.start()); ts.foreach(_.join())
    (one, (System.nanoTime() - t0) / 1e9)
  }

  /** Fixed-work MEMORY-STREAMING probe (r15): wall seconds to stream a
    * 128 MiB buffer several times at cache-line stride. The register-only
    * spin() is PHYSICALLY blind to pure memory-bandwidth contention (it
    * touches no memory), and bandwidth is exactly what co-tenant load
    * degrades first on this host (BASELINE.md host-epoch section) — the
    * r14 driver artifact carried rows 2-5x inflated with fgn = 0.0. This
    * probe is bandwidth-bound by construction (stride 8 longs = one
    * 64-byte line per load, defeating cache reuse), so it stretches under
    * BOTH contention classes: hypervisor-level deschedule (wall passes,
    * no work done — same as spin) and bandwidth co-tenancy (lines arrive
    * slower — invisible to spin). Quiet nominal on this host ~0.1 s
    * (measured r15); loudness is judged RELATIVE to the session floor,
    * not an absolute constant, so host-epoch drift can't stale it.
    */
  private lazy val memBuf = new Array[Long](16 << 20) // 128 MiB
  private def memSpin(): Double = {
    val buf = memBuf
    val t0 = System.nanoTime()
    var s = 0L
    var pass = 0
    while (pass < 10) {
      var i = pass % 8 // rotate the lane so passes aren't line-identical
      val n = buf.length
      while (i < n) { s += buf(i); i += 8 }
      pass += 1
    }
    if (s == 42L) println("?") // keep the loop un-eliminable
    (System.nanoTime() - t0) / 1e9
  }

  private def loadavg(): String =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .trim.split("\\s+").take(3).mkString(",")
    catch { case _: Throwable => "" }

  /** (total busy jiffies across all CPUs, this process's jiffies).
    * The difference of deltas over a window is CPU burned by OTHER
    * processes — the only mid-pass foreign-load discriminator that
    * works here, because our own local[32] work drives the 1-min
    * loadavg to 4-19 all by itself (measured r14: a quiet-host QT run
    * ended at loadavg 19.1), so a raw loadavg threshold would flag
    * every busy row of a clean pass. Busy includes user+nice+system+
    * irq+softirq+steal (steal: hypervisor-level contention is foreign
    * too); idle and iowait are excluded. Self = utime+stime of the
    * whole JVM (all Spark threads — local mode is one process).
    */
  private[graft] def cpuSample(): (Long, Long) = {
    try {
      val stat = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0).trim.split("\\s+")
      // cpu user nice system idle iowait irq softirq steal ...
      val v = stat.drop(1).map(_.toLong)
      val busy = v(0) + v(1) + v(2) + v(5) + v(6) +
        (if (v.length > 7) v(7) else 0L)
      val self = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")), "UTF-8")
      // fields 14,15 (1-based) are utime,stime; field 2 is "(comm)"
      // which may contain spaces — split after the closing paren
      val after = self.substring(self.lastIndexOf(')') + 2).split("\\s+")
      (busy, after(11).toLong + after(12).toLong)
    } catch { case _: Throwable => (0L, 0L) }
  }

  /** Average CPU cores consumed by other processes over the window
    * between two cpuSample()s of wallSec seconds. USER_HZ is 100 on
    * Linux (getconf CLK_TCK). Clamped at 0 (sampling skew can make
    * the self delta read past the busy delta on an idle host).
    */
  private[graft] def foreignCores(before: (Long, Long),
      after: (Long, Long), wallSec: Double): Double = {
    if (wallSec <= 0 || (before._1 == 0L && before._2 == 0L)) return 0.0
    val fgn = (after._1 - before._1) - (after._2 - before._2)
    math.max(0.0, fgn / 100.0 / wallSec)
  }

  /** Foreign cores right now, over a short dedicated window. */
  private def foreignNow(windowMs: Long = 1000): Double = {
    val a = cpuSample(); Thread.sleep(windowMs); val b = cpuSample()
    foreignCores(a, b, windowMs / 1000.0)
  }

  // quiet-host baselines x2 (see scaladoc); either exceeding its bound
  // marks the surrounding pass as suspect
  private val Calib1tMax = 0.25
  private val Calib32tMax = 0.6
  private def suspect(c: (Double, Double)): Boolean =
    c._1 > Calib1tMax || c._2 > Calib32tMax

  // per-query guard thresholds (scaladoc): retry when the timed run is
  // 3x its own warm-pass time AND big enough for the ratio to mean
  // anything (sub-0.3 s queries jitter past 3x on scheduler noise alone)
  private val WarmRatioMax = 3.0
  private val MinGuardSec = 0.3
  // BIG rows (warm >= 2 s) get a tighter 1.5x guard (round-11, from the
  // r10 driver artifact): mid-pass contention inflated un-guarded big
  // rows 2x-8.6x (curate_e2e 4.8 s -> 41.8 s) while (a) the whole-pass
  // brackets read quiet and (b) the 3x warm-ratio guard stayed silent.
  // Big rows are the stable end of the surface (quiet jitter < ~20%),
  // so 1.5x over warm is already weather. Each big row also takes a
  // pre-row spin — evidence for the suspect flag when its warm baseline
  // was itself contended (the one case no warm-relative trigger can
  // catch). A spurious re-roll costs one extra roll of that row and
  // keep-faster is harmless; quiet overhead is one ~0.1 s spin per big
  // row (~13 rows on the sf0.1 surface).
  private val BigRowSec = 2.0
  private val BigRatioMax = 1.5

  // quiet-start gate bounds: the 1-min loadavg is read before this JVM
  // does any work, so anything substantially above idle is OTHER load.
  // Empirical (r13): a start at loadavg 3.67 passed a 4.0 threshold
  // with clean spin calibs yet inflated the whole pass ~30% — sustained
  // background load hurts through memory bandwidth long before it
  // starves the spin probe. 2.5 catches that class; the wait cap keeps
  // a persistently busy host degrading to the old start-immediately
  // behavior instead of blocking the driver.
  private val QuietLoadMax = 2.5
  private val QuietWaitMaxSec = 600.0

  // mid-pass foreign-load threshold (average foreign CORES over a
  // row's window, from /proc/stat minus /proc/self — see cpuSample):
  // a quiet host's daemons+kworkers read < ~0.5; the r13 contended
  // window's foreign processes would have read well above 2. Rows
  // whose kept window exceeded this are re-rolled at end of pass.
  private val FgnCoresMax = 2.0
  // bound on waiting for the host to go quiet before the end-of-pass
  // re-roll block (then re-roll anyway — keep-faster is harmless and
  // the re-roll window's own stamp tells the reader what it saw)
  private val RerollWaitMaxSec = 180.0

  // SESSION-FLOOR loudness triggers (r15): the fgn stamp is blind to
  // contention that burns no guest-visible CPU — the r14 driver
  // artifact carried rows 2-5x inflated with fgn1 = fgn2 = 0.0 and an
  // empty reroll_trace, while the SIGNAL was already in the artifact:
  // those rows' spin brackets read 0.27-0.49 s against the session's
  // 0.093 s floor (3-5x), and the guard never compared them. A probe
  // reading (spin or memSpin) is LOUD when it exceeds FloorRatioMax
  // times the smallest same-kind reading observed this session (the
  // floor is a running min over every probe the run takes — quiet-gate
  // calibrations seed it, and late quiet windows adjudicate early loud
  // rows because the comparison happens at end of pass). The absolute
  // minimums only guard against a pathologically fast floor reading;
  // quiet nominals on this host are spin ~0.095 s / mem ~0.115 s, so
  // 2.5x floor lands near the old absolute Calib1tMax for spin.
  private val FloorRatioMax = 2.5
  private val SpinLoudMinSec = 0.2
  private val MemLoudMinSec = 0.25
  // committed clean pairing band (spark_oracle_subset / duckdb_wall):
  // ~0.47-0.52x across quiet same-session boards (BASELINE.md r14
  // decomposition; the low guard catches a weather-inflated DuckDB
  // denominator like r12's 0.402x, the high guard a weather-inflated
  // Spark numerator like the r14 driver board's 0.781x). A full-surface
  // board outside the band self-marks pairing_band_ok=false instead of
  // waiting for a reader to notice; scoped runs emit null (their subset
  // pairing is not the band's quantity).
  private val PairingBandLo = 0.40
  private val PairingBandHi = 0.57

  /** Forces the COMPLETE plan: digest-aggregates every output column (so
    * pruning can't drop payload work). `useForeach` is precomputed in the
    * warm pass for outputs xxhash64 can't hash (e.g. map columns).
    */
  private def consume(df: DataFrame, useForeach: Boolean): Unit =
    if (useForeach) df.foreach(_ => ())
    else df.select(xxhash64(struct(df.columns.map(col): _*)).as("_h"))
      .agg(expr("bit_xor(_h)")).head() // bit_xor: no ANSI long overflow

  private def fmt(v: Double): String = f"$v%.3f"

  /** fgn / la stamp the KEPT attempt's window: average foreign cores
    * (the discriminator) and 1-min loadavg at row end (context only —
    * conflated with our own work's contribution). cMax / mMax (r15) are
    * the kept attempt's worst spin / memSpin bracket — 0.0 for small
    * rows that never took a bracket (their inflation damage is bounded
    * by their size; the fgn stamp still covers them).
    */
  private final case class QRes(name: String, sec: Double,
                                reran: Boolean, suspect: Boolean,
                                fgn: Double = 0.0, la: Double = 0.0,
                                cMax: Double = 0.0, mMax: Double = 0.0)

  /** Same-session DuckDB wall over the oracle SQL set: (total seconds,
    * failed-query count). None when the script/python/duckdb is
    * unavailable or errors — the bench result must never depend on the
    * measurement sidecar existing. The failed count matters: a failing
    * oracle is excluded from the DuckDB total while its Spark time still
    * counts in spark_oracle_subset, so a nonzero value flags the pair as
    * not like-for-like.
    *
    * Process hygiene: stderr (per-query timings + failure detail) is
    * DISCARDED and stdout is REDIRECTED TO A FILE — an undrained pipe
    * would fill and deadlock the child, and the r12 PERQ line grows
    * with the oracle set (O(#queries) JSON — a 64 KB pipe stops being
    * "fits any buffer" at ~1.5k queries), so no pipe exists at all;
    * waitFor runs first, then the file is read.
    */
  /** Parse the PERQ line's flat {"name": seconds, ...} object — query
    * names are plain identifiers (no quotes/commas inside), so a
    * split-based read is exact for what duckdb_wall.py emits.
    */
  private def parsePerQuery(s: String): Map[String, Double] =
    s.trim.stripPrefix("{").stripSuffix("}").split(",")
      .iterator.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
        val i = kv.lastIndexOf(':')
        if (i < 0) None
        else scala.util.Try(
          kv.take(i).trim.stripPrefix("\"").stripSuffix("\"") ->
            kv.drop(i + 1).trim.toDouble).toOption
      }.toMap

  /** Fourth tuple slot (r14): average foreign cores over the DuckDB
    * window, with the duck child's own CPU subtracted (via
    * ProcessHandle.Info.totalCpuDuration) — the duck wall was the one
    * UNGUARDED measurement window (it runs after the pass with no
    * trust guard), and the r12->r13 pairing "creep" turned out to be
    * exactly this window's weather: r12's denominator read 124 s where
    * every quiet re-measurement lands 84-95 s (BASELINE.md r14).
    */
  private def duckdbWall(sfDir: String, cpus: String)
      : Option[(Double, Int, Map[String, Double], Double)] = {
    val script = java.nio.file.Paths.get("tools/duckdb_wall.py")
    if (!java.nio.file.Files.exists(script)) return None
    val tmp = java.nio.file.Files.createTempFile("graft_oracle", ".json")
    val outFile = java.nio.file.Files.createTempFile("graft_duck", ".out")
    try {
      java.nio.file.Files.write(tmp,
        OracleJson.oracleJson.getBytes("UTF-8"))
      val pb = new ProcessBuilder("python3", script.toString,
        sfDir, tmp.toString, cpus)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      pb.redirectOutput(outFile.toFile)
      val s0 = cpuSample()
      val t0 = System.nanoTime()
      val p = pb.start()
      try {
        // The child's own CPU must be sampled WHILE IT IS ALIVE:
        // after waitFor reaps it, info().totalCpuDuration() is
        // Optional.empty on this JDK (verified r14 review), so a
        // single post-exit read always subtracted 0 and the duck's own
        // burn was reported as third-party contention (the committed
        // r14 snapshots read duck_fgn 1.4-2.0 on hosts the same run
        // declared quiet). Poll every 500 ms, keep the last reading,
        // and attempt one final read right after exit (harmless if
        // already reaped) — the residual under-read is bounded by one
        // poll interval of tail burn, and a sub-interval child yields
        // duckCpuSec 0, which only makes the stamp CONSERVATIVE
        // (over-reports foreign load) for a window too short to matter.
        var duckCpuSec = 0.0
        def sampleDuck(): Unit =
          try p.info().totalCpuDuration()
            .ifPresent(d => duckCpuSec = d.toMillis / 1e3)
          catch { case _: Throwable => () }
        var done = false
        val deadline = System.nanoTime() + 20L * 60 * 1000 * 1000 * 1000
        while (!done && System.nanoTime() < deadline) {
          done = p.waitFor(500, java.util.concurrent.TimeUnit.MILLISECONDS)
          sampleDuck()
        }
        val wallSec = (System.nanoTime() - t0) / 1e9
        val s1 = cpuSample()
        // foreignCores counts the child as foreign (it's not /proc/self);
        // subtract its cores to isolate third-party load in the window
        val fgn = math.max(0.0,
          foreignCores(s0, s1, wallSec) - duckCpuSec / wallSec)
        if (!done) { p.destroyForcibly(); None }
        else if (p.exitValue() != 0) None
        else {
          val out = new String(
            java.nio.file.Files.readAllBytes(outFile), "UTF-8")
          val lines = out.trim.split("\n").map(_.trim)
          val perq = lines.find(_.startsWith("PERQ "))
            .map(l => parsePerQuery(l.drop(5)))
            .getOrElse(Map.empty[String, Double])
          lines.lastOption.map(_.split("\\s+")).collect {
            case Array(total, failed) =>
              (total.toDouble, failed.toInt, perq, fgn)
            case Array(total) => (total.toDouble, 0, perq, fgn)
          }
        }
      } finally if (p.isAlive) p.destroyForcibly()
    } catch { case _: Throwable => None }
    finally {
      try java.nio.file.Files.deleteIfExists(tmp)
      catch { case _: Throwable => () }
      try java.nio.file.Files.deleteIfExists(outFile)
      catch { case _: Throwable => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the two merge aggregations are TypedImperativeAggregates; the
      // default 128-group fallback makes ObjectHashAggregate effectively
      // sort-based on genome-scale group counts. 256k groups/partition
      // is a bounded middle ground (partition sizing keeps per-partition
      // groups under it at scale). BOUNDARY (r14, measured): this pin is
      // safe at bench scale (sf0.1, 1x) ONLY — at 100x fan-out on an
      // 8 GiB heap it OOMs reproducibly (ObjectHashAggregate holds every
      // per-partition collect_list buffer in memory; Scale10xMain A/B,
      // BASELINE.md r14 ladder re-baseline). Do not copy it into a
      // fan-out-scale job: the sort-based fallback is the memory-safe
      // shape there.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Quiet-start gate (r13): the r12 driver artifact began at loadavg
    // 5.78 and its WARM pass — every row's throttle-guard baseline —
    // absorbed the contention, which both inflated committed walls
    // (one row read 14x its quiet value) and blinded the warm-relative
    // retry guard. No in-pass guard can repair a contaminated baseline,
    // so don't start until the host looks quiet: while the spin
    // calibration or 1-min loadavg reads contended, sleep and re-probe,
    // up to a hard bound (then proceed regardless — a busy host must
    // degrade to the old behavior, never block the driver). The wait is
    // emitted as quiet_wait_sec so a reader can see the run self-delayed.
    // r14 (advice): the wait cap is overridable so a deliberately
    // contended probe run doesn't block 10 min at start (0 disables
    // the gate; the probe exercises the MID-pass machinery instead)
    val quietWaitMax = sys.env.get("SPARK_GRAFT_QUIET_WAIT_MAX")
      .flatMap(s => scala.util.Try(s.toDouble).toOption)
      .getOrElse(QuietWaitMaxSec)
    // session probe floors (r15): running min over every same-kind probe
    // reading this run takes — quiet-gate calibrations seed them, per-row
    // brackets and re-roll-window probes keep refining them. Loudness is
    // judged against the floor AT USE TIME (end of pass / re-roll), so a
    // quiet window anywhere in the session adjudicates loud rows anywhere
    // else. A min can only be lowered by a genuinely-fast reading, so
    // contaminated (slow) observations never desensitize the trigger.
    var spinFloor = Double.MaxValue
    var memFloor = Double.MaxValue
    def spinF(): Double = {
      val s = spin(); spinFloor = math.min(spinFloor, s); s
    }
    def memF(): Double = {
      val s = memSpin(); memFloor = math.min(memFloor, s); s
    }
    def calibrateF(): (Double, Double) = {
      val c = calibrate(); spinFloor = math.min(spinFloor, c._1); c
    }
    def spinLoud(c: Double): Boolean =
      c > math.max(FloorRatioMax * spinFloor, SpinLoudMinSec)
    def memLoud(c: Double): Boolean =
      c > math.max(FloorRatioMax * memFloor, MemLoudMinSec)
    val quietWaitSec = {
      spin() // JIT warm-up: a cold first spin must not read as contention
      memSpin() // ditto for the streaming probe (first call page-faults
      // the 128 MiB buffer in); the SECOND reading below seeds the floor
      // loadavg is sampled BEFORE each calibration burst: the 33-spin
      // probe itself adds to the 1-min average, and sampling after it
      // would let the gate re-trigger on its own load near the
      // threshold. Only slept time is reported — probe cost isn't wait.
      // r14 (advice): the burst is SKIPPED while loadavg alone reads
      // loud — each burst adds ~1-2 to the 1-min EMA still present at
      // the next sample, so a host hovering just under the threshold
      // could self-sustain the gate to the full cap on its own probes.
      def la(): Double = try loadavg().split(",")(0).toDouble catch
        { case _: Throwable => 0.0 }
      def probe(): (Double, (Double, Double)) = {
        val l = la()
        if (l > QuietLoadMax) (l, (0.0, 0.0))
        else { memF(); (l, calibrateF()) }
      }
      var slept = 0.0
      var (lav, cal) = probe()
      while ((suspect(cal) || lav > QuietLoadMax) &&
             slept < quietWaitMax) {
        Thread.sleep(20000)
        slept += 20.0
        val p = probe(); lav = p._1; cal = p._2
      }
      memF() // guarantee a finite mem floor even when the gate's
      // calibration bursts were all skipped (loud loadavg / zero cap)
      slept
    }
    val loadStart = loadavg()

    // harness-probe hook (r15): mark the quiet gate's end so a probe can
    // inject load AFTER the floors are seeded quiet but BEFORE the warm
    // pass — the exact shape of contention arriving early and persisting
    // (warm-relative guards blind, floors honest). Same file as the
    // timed_start marker below; probes match on CONTENT, not existence.
    sys.env.get("SPARK_GRAFT_PHASE_FILE").foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        "warm_start".getBytes("UTF-8"))
      catch { case _: Throwable => }
    }

    // warm pass: touch every table, then run each query once so the timed
    // pass measures steady state (codegen compiled, footers cached, JIT
    // warm) — the regime a long-running cluster job actually operates in.
    // Also decides per-query whether the digest action applies or the
    // query needs the foreach fallback, and records each query's WARM
    // time as its personal throttle-guard threshold for the timed pass.
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    // ops dumps execute many driver actions by design (audit side passes;
    // the merge replay is a SINK writing parquet snapshots). They ARE on
    // the timed surface (untimed surface is where cost hides — round-4/5
    // lesson) but pinned to run LAST within each pass, so the replay's
    // writeback can't contaminate neighboring query timings.
    val opsDumps = Set("a7_counter_dump", "ev_merge_replay",
      "ev_dedup_incremental", "pack_shard_roundtrip")
    // optional surface filter (r14): a comma list of query names for
    // scoped harness probes (the contention probe runs a 12-query
    // surface). Unset = the full registered surface, as always.
    val onlyQueries = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sorted = SparkEntry.queries.toSeq
      .filter { case (n, _) => onlyQueries.forall(_.contains(n)) }
      .sortBy { case (n, _) => (if (opsDumps(n)) 1 else 0, n) }
    val warmInfo = sorted.map { case (name, fn) =>
      // Some(useForeach) on success; None when both actions throw. Only
      // the SUCCESSFUL action is timed: a digest attempt that throws
      // before the foreach fallback would otherwise inflate the warm
      // time and desensitize the 3x outlier guard for exactly the
      // queries that use the fallback.
      def timed(fb: Boolean): Option[(Boolean, Double)] = {
        val t0 = System.nanoTime()
        try { consume(fn(spark, sfDir), useForeach = fb)
              Some((fb, (System.nanoTime() - t0) / 1e9)) }
        catch { case _: Throwable => None }
      }
      (name, timed(false).orElse(timed(true)))
    }
    val useForeach = warmInfo
      .map { case (n, r) => n -> r.exists(_._1) }.toMap
    // warm time only exists when a warm run succeeded (a throwing warm
    // run measures the time-to-throw)
    val warm = warmInfo.collect { case (n, Some((_, t))) => n -> t }.toMap

    // harness-probe hook (r14): when SPARK_GRAFT_PHASE_FILE is set,
    // mark the warm pass's end so BenchContentionMain can align its
    // injected foreign load with the timed pass. No-op in driver runs.
    sys.env.get("SPARK_GRAFT_PHASE_FILE").foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        "timed_start".getBytes("UTF-8"))
      catch { case _: Throwable => }
    }

    // a FAILED query reports its elapsed-until-throw time NEGATED, so a
    // broken query can't masquerade as a fast one and deflate the total
    // (failures are additionally listed in the JSON's "failed" field)
    // one attempt of one query, stamped with its window's foreign-core
    // average (see cpuSample scaladoc — the only discriminator our own
    // 32-thread work can't pollute)
    def attempt(name: String): (Double, Boolean, Double) = {
      val s0 = cpuSample()
      val t0 = System.nanoTime()
      val ok =
        try { consume(SparkEntry.queries(name)(spark, sfDir),
          useForeach(name)); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, ok, foreignCores(s0, cpuSample(), dt))
    }
    def la1(): Double = try loadavg().split(",")(0).toDouble catch
      { case _: Throwable => 0.0 }

    def timedPass(): (Seq[QRes], List[String]) = {
      val trace = scala.collection.mutable.ListBuffer[String]()
      val rs = sorted.map { case (name, _) =>
        val w = warm.getOrElse(name, 0.0)
        val isBig = w >= BigRowSec
        // big rows get pre-row probes so the retry trigger doesn't
        // depend on a warm baseline that may itself be contended; the
        // memSpin (r15) additionally sees pure-bandwidth contention the
        // register spin is physically blind to
        val mPre = if (isBig) memF() else 0.0
        val cPre = if (isBig) spinF() else 0.0
        var (dt, ok, fgn) = attempt(name)
        var reran = false
        var susp = false
        // worst probe brackets of the KEPT attempt (r15): fed to the
        // end-of-pass floor-relative loudness triggers
        var cMax = cPre
        var mMax = mPre
        val ratioMax = if (isBig) BigRatioMax else WarmRatioMax
        // big rows ALSO retry whenever a pre-row probe read contended,
        // independent of the warm ratio — when the warm pass itself ran
        // under contention the inflated baseline makes the ratio gate
        // blind (the r10 artifact's exact failure), and the pre-row
        // probes are the only weather evidence that doesn't depend on it
        val trig = (w > 0 && dt > ratioMax * w && dt > MinGuardSec) ||
          (isBig && (cPre > Calib1tMax || memLoud(mPre)))
        if (ok && trig) {
          // outlier vs the query's OWN warm time: probe the host,
          // retry once, probe again; keep the faster attempt
          val c1 = spinF()
          val m1 = memF()
          val (dt2, ok2, fgn2) = attempt(name)
          val c2 = spinF()
          val m2 = memF()
          reran = true
          val pre = if (isBig)
            s""""calib0":${fmt(cPre)},"mem0":${fmt(mPre)},""" else ""
          trace += s"""{"q":"$name","warm":${fmt(w)},$pre"t1":${fmt(dt)},""" +
            s""""calib1":${fmt(c1)},"mem1":${fmt(m1)},""" +
            s""""t2":${fmt(if (ok2) dt2 else -dt2)},""" +
            s""""calib2":${fmt(c2)},"mem2":${fmt(m2)},""" +
            s""""fgn1":${fmt(fgn)},"fgn2":${fmt(fgn2)}}"""
          if (ok2 && dt2 < dt) {
            dt = dt2; fgn = fgn2
            cMax = math.max(c1, c2); mMax = math.max(m1, m2)
          } else {
            cMax = math.max(cPre, c1); mMax = math.max(mPre, m1)
          }
          // still an outlier AND the host was provably not granting CPU
          // around it -> the number is weather, not engine
          susp = dt > ratioMax * w &&
            (cPre > Calib1tMax || c1 > Calib1tMax || c2 > Calib1tMax)
        } else if (isBig) {
          // close the brackets: without post-row probes a contention
          // episode confined to the row's own window would leave only
          // the (quiet) pre-row readings on record
          cMax = math.max(cPre, spinF())
          mMax = math.max(mPre, memF())
        }
        QRes(name, if (ok) dt else -dt, reran, susp, fgn, la1(),
          cMax, mMax)
      }
      (rs, trace.toList)
    }

    // timed pass bracketed by calibrations; if either bracket looks
    // throttled, run one more pass and keep the faster (with ITS brackets)
    var calPre = calibrateF()
    // harness-probe hook (r15): mark that the pre-pass calibration is
    // done and the timed rows are about to start — lets a probe inject
    // contention into the ROWS' windows while both whole-pass brackets
    // stay quiet, the exact r14-driver signature the per-row triggers
    // exist for (a window covering the brackets is adjudicated by the
    // pass-level rerun instead and never reaches them)
    sys.env.get("SPARK_GRAFT_PHASE_FILE").foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        "pass_rows_start".getBytes("UTF-8"))
      catch { case _: Throwable => }
    }
    var (pass, trace) = timedPass()
    var calPost = calibrateF()
    var passes = 1
    if (suspect(calPre) || suspect(calPost)) {
      val calPre2 = calibrateF()
      val (pass2, trace2) = timedPass()
      val calPost2 = calibrateF()
      passes = 2
      // fewer failures beats faster: a pass where a query crashed in 1s
      // must not outrank a pass where it succeeded in 10s
      def passKey(p: Seq[QRes]): (Int, Double) =
        (p.count(_.sec < 0), p.map(r => math.abs(r.sec)).sum)
      if (Ordering[(Int, Double)].lt(passKey(pass2), passKey(pass))) {
        calPre = calPre2; pass = pass2; calPost = calPost2; trace = trace2
      }
    }

    // END-OF-PASS loud-window re-roll (r14, widened r15): the per-query
    // trust guard is warm-RELATIVE — when warm and timed share the same
    // weather (contention arriving early and persisting, the r13
    // artifact) it never fires, and the quiet-START gate can't see
    // contention that arrives mid-run (r13 started at loadavg 2.41 and
    // ended at 9.42 with rows 2-6x their clean values). Three ABSOLUTE
    // triggers select rows for re-roll:
    //   fgn  — kept window burned > FgnCoresMax foreign cores (r14);
    //   spin — kept window's worst spin bracket > FloorRatioMax x the
    //          session spin floor (r15: the r14 driver artifact's three
    //          2-5x rows carried brackets 3-5x the floor with fgn 0.0 —
    //          the signal was in the artifact, nothing compared it);
    //   mem  — same, for the memory-streaming probe (r15: catches pure
    //          bandwidth co-tenancy, which no register spin can see).
    // Selected rows are re-rolled after a bounded wait for the host to
    // go quiet BY ALL TRIGGERS; keep-faster, stamped, traced. r15 fixes
    // the confirm rule: a re-roll that comes back no faster CONFIRMS
    // the original only when the re-roll window was quiet by every
    // trigger — two loud windows are two bad measurements, not an
    // adjudication (the r14 driver's corpus_curate_increment_bloom, 4x
    // inflated, was blessed exactly that way).
    var rerollWaitSec = 0.0
    def rowLoudWhy(r: QRes): String =
      if (r.fgn > FgnCoresMax) "fgn"
      else if (spinLoud(r.cMax)) "spin"
      else if (memLoud(r.mMax)) "mem"
      else ""
    val loud = pass.filter(r => r.sec > MinGuardSec && rowLoudWhy(r).nonEmpty)
    val rerollTrace = scala.collection.mutable.ListBuffer[String]()
    if (loud.nonEmpty) {
      val rerollWaitMax = sys.env.get("SPARK_GRAFT_REROLL_WAIT_MAX")
        .flatMap(s => scala.util.Try(s.toDouble).toOption)
        .getOrElse(RerollWaitMaxSec)
      while ((foreignNow() > FgnCoresMax || spinLoud(spinF()) ||
              memLoud(memF())) && rerollWaitSec < rerollWaitMax) {
        Thread.sleep(10000)
        rerollWaitSec += 11.0 // 10 s sleep + ~1.2 s probe window
      }
      val redone = loud.map { r =>
        val why = rowLoudWhy(r)
        val rm1 = memF()
        val rc1 = spinF()
        val (dt2, ok2, fgn2) = attempt(r.name)
        val rc2 = spinF()
        val rm2 = memF()
        val rcMax = math.max(rc1, rc2)
        val rmMax = math.max(rm1, rm2)
        val rerollLoud = fgn2 > FgnCoresMax || spinLoud(rcMax) ||
          memLoud(rmMax)
        rerollTrace += s"""{"q":"${r.name}","why":"$why",""" +
          s""""t1":${fmt(r.sec)},"fgn1":${fmt(r.fgn)},""" +
          s""""cmax1":${fmt(r.cMax)},"mmax1":${fmt(r.mMax)},""" +
          s""""t2":${fmt(if (ok2) dt2 else -dt2)},"fgn2":${fmt(fgn2)},""" +
          s""""calib2":${fmt(rcMax)},"mem2":${fmt(rmMax)}}"""
        if (ok2 && dt2 < r.sec)
          r.copy(sec = dt2, reran = true, fgn = fgn2, la = la1(),
            suspect = rerollLoud, cMax = rcMax, mMax = rmMax)
        else
          // CONFIRM only from a re-roll window quiet by every trigger;
          // a loud or failed re-roll leaves the row unadjudicated
          r.copy(reran = true, suspect = !ok2 || rerollLoud)
      }.map(r => r.name -> r).toMap
      pass = pass.map(r => redone.getOrElse(r.name, r))
    }
    val passResults = pass

    // a7/flagship ratio rows (round 9): the ops-dump perf gate is a
    // RATIO of two rows measured minutes apart in the pass, and its
    // weather band is ±0.2 even on quiet hosts — one contended window
    // under either row flips the verdict. Roll the PAIR twice more
    // back-to-back (interleaved, so both rows sample the same weather
    // windows). r16 fixes the KEEP rule: every roll is bracketed by the
    // same fgn/spin/mem window probes the per-row trust guard uses, and
    // the kept `queries{}` value is the MEDIAN OF THE QUIET-WINDOW
    // SAMPLES ONLY (median-of-1 = itself; of-2 = the faster, the
    // keep-faster precedent). On a quiet host all three samples are
    // quiet and the kept value is the historical median-of-3 — the
    // clean board is unchanged by construction. Under contention the
    // loud rolls stay in ratio_trace with why-stamps but can no longer
    // be the published number (BENCH_r15 published flagship 21.3 s
    // while its own trace held a fully-quiet 8.82 s roll — the
    // median-of-3-including-loud-rolls rule measured the truth and then
    // reported the weather). A row with NO quiet sample keeps the
    // all-sample median and goes to `suspect`.
    val ratioRows = Seq("gaf_pipeline_e2e", "a7_counter_dump")
    case class Roll(sec: Double, fgn: Double, cMax: Double, mMax: Double) {
      def why: String =
        if (fgn > FgnCoresMax) "fgn"
        else if (spinLoud(cMax)) "spin"
        else if (memLoud(mMax)) "mem"
        else ""
    }
    val ratioExtra =
      scala.collection.mutable.Map.empty[String, List[Roll]]
        .withDefaultValue(Nil)
    if (ratioRows.forall(n => SparkEntry.queries.contains(n) &&
        passResults.exists(r => r.name == n && r.sec > 0))) {
      for (_ <- 1 to 2; n <- ratioRows) {
        val m1 = memF()
        val c1 = spinF()
        val (dt, ok, fgn) = attempt(n)
        val c2 = spinF()
        val m2 = memF()
        if (ok) ratioExtra(n) = ratioExtra(n) :+
          Roll(dt, fgn, math.max(c1, c2), math.max(m1, m2))
      }
    }
    // the re-rolls run AFTER the calPost bracket — re-probe so host
    // contention that covers only the roll window still flags the run
    val calRoll = if (ratioExtra.nonEmpty) calibrateF() else calPost
    val throttled =
      suspect(calPre) || suspect(calPost) || suspect(calRoll)
    // per-row adjudication (no all-or-nothing symmetry gate: a kept
    // quiet-window value is the best estimate for ITS row regardless of
    // what the other row collected, and a no-quiet-sample row is
    // flagged suspect — the ratio's reader sees the flag either way)
    case class Adjudicated(kept: Double, policy: String,
                           samples: List[Roll])
    def quietMedian(rolls: List[Roll]): Double = {
      val s = rolls.map(_.sec).sorted
      s((s.size - 1) / 2) // median odd; FASTER of the middle pair even
    }
    val adjudicatedRows: Map[String, Adjudicated] = passResults
      .filter(r => r.sec > 0 && ratioExtra(r.name).nonEmpty)
      .map { r =>
        val samples = Roll(r.sec, r.fgn, r.cMax, r.mMax) ::
          ratioExtra(r.name)
        val quiet = samples.filter(_.why.isEmpty)
        val adj =
          if (quiet.nonEmpty)
            Adjudicated(quietMedian(quiet),
              if (quiet.size == samples.size) "quiet_all" else "quiet_pick",
              samples)
          else
            Adjudicated(quietMedian(samples), "no_quiet_suspect", samples)
        r.name -> adj
      }.toMap
    val results = passResults.map { r =>
      adjudicatedRows.get(r.name) match {
        case Some(a) =>
          r.copy(sec = a.kept,
            suspect = r.suspect || a.policy == "no_quiet_suspect")
        case None => r
      }
    }
    val ratioTrace = ratioRows
      .filter(adjudicatedRows.contains)
      .map { n =>
        val a = adjudicatedRows(n)
        val ss = a.samples.map(s =>
          s"""{"t":${fmt(s.sec)},"fgn":${fmt(s.fgn)},""" +
            s""""cmax":${fmt(s.cMax)},"mmax":${fmt(s.mMax)},""" +
            s""""why":"${s.why}"}""").mkString("[", ",", "]")
        s""""$n":{"samples":$ss,"kept":${fmt(a.kept)},""" +
          s""""policy":"${a.policy}"}"""
      }.mkString("{", ",", "}")
    // sample-semantics flag for JSON consumers (r10 advice): when true,
    // the two ratio rows inside `queries`/`total` carry multi-sample
    // adjudicated values (pass sample + two back-to-back rolls, quiet
    // samples preferred) while every other row is single-sample, and
    // `total` excludes the ~2 extra roll walls (visible only in
    // ratio_trace). Compare ratio-row history across rounds via
    // ratio_trace, not raw `queries`, when this flag differs between
    // artifacts.
    val mixedMedians = adjudicatedRows.nonEmpty

    // same-session DuckDB wall + the Spark total over the same (oracle-
    // backed) query subset — the 2x gate's like-for-like pair
    val oracleNames = SparkEntry.oracleSql.keySet
    val sparkOracleSubset = results
      .filter(r => r.sec > 0 && oracleNames(r.name)).map(_.sec).sum
    val duckWall = duckdbWall(sfDir, cpus)
    // per-query pairing (r12): the 2x gate's aggregate ratio can hide a
    // single pathological row — pair each oracle-backed query's Spark
    // time against ITS same-session DuckDB wall, surface the worst 5
    // (with BOTH walls, so a reader sees when the "ratio" divides by a
    // trivial oracle), and FLAG rows >2x among the big rows. Floors on
    // the worst-5 list: Spark < 0.5 s measures per-action fixed cost
    // (plan analysis, job scheduling) and DuckDB < 50 ms means the
    // oracle restates the VALUES without the work (e.g.
    // pack_shard_roundtrip's oracle computes shard stats but never
    // writes shard files) — below either, the quotient is not an
    // engine-throughput comparison. The FLAG additionally requires
    // Spark >= BigRowSec: measured at sf0.1, EVERY oracle-backed row
    // under 2 s is floor-dominated (0.5-0.8 s Spark vs ms-scale DuckDB
    // on sub-million-row tables — overhead that amortizes to nothing at
    // scale), so flagging them would bury a real pathological row in 19
    // rows of noise; a genuinely slow operator lands >= 2 s even here.
    val pairFloorSparkSec = 0.5
    val pairFloorDuckSec = 0.05
    val perDuck = duckWall.map(_._3).getOrElse(Map.empty[String, Double])
    val pairAll = results.flatMap { r =>
      perDuck.get(r.name) match {
        case Some(d) if r.sec > 0 && d > 0 =>
          Some((r.name, r.sec, d, r.sec / d))
        case _ => None
      }
    }
    val pairEligible = pairAll.filter { case (_, s, d, _) =>
      s >= pairFloorSparkSec && d >= pairFloorDuckSec }
    val pairingWorst = pairEligible.sortBy(-_._4).take(5)
      .map { case (n, s, d, x) =>
        "\"" + n + s"""":{"spark":${fmt(s)},"duck":${fmt(d)},""" +
          s""""ratio":${fmt(x)}}""" }
      .mkString("{", ",", "}")
    // STORE-I/O rows are pairing-EXEMPT (r16, structural adjudication
    // of the r15 flags): their Spark side performs real durable-store
    // persistence — DedupIndexIO save + append + the localize the
    // cross-generation contract requires — while the DuckDB oracle
    // computes the same LOGIC with zero persistence (it restates the
    // classify semantics, not the storage work), so the quotient is not
    // an engine-throughput comparison. This is an exemption LIST with
    // the rows' numbers still published (pairing_exempt below), not a
    // threshold change: a reader sees exactly what was exempted, why,
    // and at what ratio; the rows' quiet bands live in BASELINE.md's QT
    // tables (dedup_incremental_stored 2.9-3.3 s, dedup_stored_replay
    // 4.3-4.8 s on quiet boards).
    val pairingExemptRows = Set("dedup_incremental_stored",
      "dedup_stored_replay")
    val pairingFlagged = pairEligible
      .filter { case (q, s, _, x) =>
        x > 2.0 && s >= BigRowSec && !pairingExemptRows(q) }
      .map(_._1).sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val pairingExempt = pairEligible
      .filter { case (q, s, _, x) =>
        x > 2.0 && s >= BigRowSec && pairingExemptRows(q) }
      .sortBy(_._1)
      .map { case (q, s, d, x) =>
        "\"" + q + s"""":{"spark":${fmt(s)},"duck":${fmt(d)},""" +
          s""""ratio":${fmt(x)},"reason":"store_io"}""" }
      .mkString("{", ",", "}")
    // pairing-band self-check (r15): the same-session pairing is the
    // judging quantity that survives host weather; a FULL-surface board
    // outside the committed clean band marks ITSELF out-of-band instead
    // of waiting for a reader to compare (the r14 driver board read
    // 0.781x — numerator weather — and carried no self-diagnosis).
    // Scoped runs emit null: a subset pairing is not the band's quantity.
    val pairing = duckWall.map { case (t, _, _, _) =>
      if (t > 0) sparkOracleSubset / t else 0.0 }
    val pairingJson = pairing.fold(
      """"pairing":null,"pairing_band_ok":null""") { x =>
      val ok =
        if (onlyQueries.isDefined) "null"
        else (x >= PairingBandLo && x <= PairingBandHi).toString
      s""""pairing":${fmt(x)},"pairing_band_ok":$ok""" }
    val loadEnd = loadavg()

    val failed = results.collect { case r if r.sec < 0 => r.name }.sorted
    val suspects = results.collect { case r if r.suspect => r.name }.sorted
    def line(rs: Seq[QRes], withWarm: Boolean): String = {
      val qs = rs.map(r => "\"" + r.name + "\":" + fmt(r.sec))
        .mkString("{", ",", "}")
      // total covers successful queries only; failures are negated in the
      // per-query map and enumerated in "failed"
      val total = results.map(_.sec).filter(_ > 0).sum
      val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val ss = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
      val tr = trace.mkString("[", ",", "]")
      val wm =
        if (!withWarm) ""
        else rs.map(r => "\"" + r.name + "\":" +
          fmt(warm.getOrElse(r.name, 0.0)))
          .mkString(""""warm_queries":{""", ",", "},") +
          // per-row window stamps (detail only): fgn = avg foreign
          // cores over the kept attempt's window (the discriminator);
          // la = 1-min loadavg at row end (context — self-conflated)
          rs.map(r => "\"" + r.name + "\":" + fmt(r.fgn))
            .mkString(""""fgn_queries":{""", ",", "},") +
          rs.map(r => "\"" + r.name + "\":" + fmt(r.la))
            .mkString(""""la_queries":{""", ",", "},") +
          // kept-attempt worst probe brackets (r15): 0.000 = the row
          // took no bracket (small row, no retry) — only big rows and
          // guard-retried rows carry them
          rs.map(r => "\"" + r.name + "\":" + fmt(r.cMax))
            .mkString(""""cmax_queries":{""", ",", "},") +
          rs.map(r => "\"" + r.name + "\":" + fmt(r.mMax))
            .mkString(""""mmax_queries":{""", ",", "},")
      val duck = duckWall.fold(
        """"duckdb_wall":null,"duckdb_failed":null,"duck_fgn":null""") {
        case (t, f, _, fg) =>
          s""""duckdb_wall":${fmt(t)},"duckdb_failed":$f,""" +
            s""""duck_fgn":${fmt(fg)}""" }
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""action":"digest","failed":$fs,"suspect":$ss,""" +
        s""""reruns":${results.count(_.reran)},"calib_trace":$tr,""" +
        s""""reroll_trace":${rerollTrace.mkString("[", ",", "]")},""" +
        s""""reroll_wait_sec":${fmt(rerollWaitSec)},""" +
        s""""ratio_trace":$ratioTrace,"ratio_rows_medianized":$mixedMedians,""" +
        s""""spark_oracle_subset":${fmt(sparkOracleSubset)},$duck,""" +
        s"""$pairingJson,"pairing_worst":$pairingWorst,""" +
        s""""pairing_flagged":$pairingFlagged,""" +
        s""""pairing_exempt":$pairingExempt,""" +
        s""""queries":$qs,$wm"sf":"$sfDir",""" +
        s""""spin_floor":${fmt(spinFloor)},"mem_floor":${fmt(memFloor)},""" +
        s""""calib_1t_pre":${fmt(calPre._1)},"calib_32t_pre":${fmt(calPre._2)},""" +
        s""""calib_1t_post":${fmt(calPost._1)},"calib_32t_post":${fmt(calPost._2)},""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd",""" +
        s""""quiet_wait_sec":${fmt(quietWaitSec)},""" +
        s""""passes":$passes,"throttled":$throttled}"""
    }
    // full per-query detail goes to a file (the driver's stdout capture
    // keeps only the tail, which would truncate a 79-entry line — the
    // round-1 "parsed": null); the PRINTED line carries the total plus
    // the headline (slowest) queries and stays under the capture window.
    val detail = line(results, withWarm = true)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"),
      detail.getBytes("UTF-8"))
    catch { case _: Throwable => }
    // ALSO snapshot to a round+SF-stamped name so per-query history
    // survives rounds (round-2 verdict couldn't diff 7 dedup queries
    // because bench_detail.json is overwritten and BENCH_r{N}.json is
    // tail-truncated). Round = 1 + the highest committed BENCH_r{N}.json.
    try {
      val re = "BENCH_r(\\d+)\\.json".r
      var maxR = 0
      val stream = java.nio.file.Files.list(java.nio.file.Paths.get("."))
      try {
        val it = stream.iterator()
        while (it.hasNext) it.next().getFileName.toString match {
          case re(n) => maxR = math.max(maxR, n.toInt)
          case _     =>
        }
      } finally stream.close()
      val sfLabel = java.nio.file.Paths.get(sfDir).getFileName.toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"bench_detail_r${maxR + 1}_$sfLabel.json"),
        detail.getBytes("UTF-8"))
    } catch { case _: Throwable => }
    val headline = results.sortBy(r => -math.abs(r.sec)).take(12)
      .sortBy(_.name)
    println(line(headline, withWarm = false))
    spark.stop()
  }
}
