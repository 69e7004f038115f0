package graft

import java.nio.file.{Files, Paths}

/** Deliberately-contended-host probe for Bench's r14 mid-pass
  * contention machinery (VERDICT r13 item 1): launches `graft.Bench`
  * as a subprocess on a scoped 12-query surface at sf0.001, injects
  * foreign CPU load (five one-core shell spinners — enough to clear
  * FgnCoresMax=2 while leaving the 32-wide spin calibration brackets
  * nominal, mirroring the r13 artifact where contention was invisible
  * to every spin probe) from JVM start until shortly after the timed
  * pass begins, then drains the load and lets the end-of-pass re-roll
  * run in a quiet window. Prints the run's per-row foreign-core
  * stamps, the reroll trace, and a PASS/FAIL summary: the probe
  * demonstrates that rows timed under foreign load get stamped
  * loud (fgn > 2) and re-rolled at end of pass.
  *
  * Run: sbt "Test/runMain graft.BenchContentionMain"
  */
object BenchContentionMain {
  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  def main(args: Array[String]): Unit = {
    val tmp = Files.createTempDirectory("benchprobe")
    val phase = tmp.resolve("phase.txt")
    val out = tmp.resolve("bench.out")
    // >0.3 s rows at sf0.001 (below MinGuardSec a loud stamp is not
    // re-rolled by design); excludes a7_counter_dump so the ratio-pair
    // extra rolls don't run on the scoped surface
    val queries = Seq(
      "gaf_pipeline_e2e", "corpus_curate_e2e", "corpus_curate_full",
      "corpus_curate_quantile", "corpus_curate_lines_terms",
      "corpus_curate_increment_bloom", "sim_semdedup_text",
      "dedup_incremental_semantic_fold", "dedup_incremental_bloom_fold",
      "sim_semdedup_hier", "dedup_span_stats", "text_perplexity_buckets",
    ).mkString(",")
    val cmd = (Seq("java") ++ jdk17AddOpens ++ Seq(
      "-Xmx8g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"), "graft.Bench")
      ).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(tmp.toFile)
    pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    pb.environment().put("SPARK_GRAFT_BENCH_QUERIES", queries)
    pb.environment().put("SPARK_GRAFT_QUIET_WAIT_MAX", "0")
    pb.environment().put("SPARK_GRAFT_PHASE_FILE", phase.toString)
    pb.redirectOutput(out.toFile)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val t0 = System.nanoTime()
    val bench = pb.start()
    // foreign load from bench JVM start: the warm pass absorbs it too,
    // so the warm-RELATIVE trust guard is blind — exactly r13's shape
    val spinners = (1 to 5).map(_ =>
      new ProcessBuilder("sh", "-c", "while : ; do : ; done").start())
    try {
      // match on CONTENT: since r15 the phase file is written several
      // times (warm_start at gate end, timed_start after warm,
      // pass_rows_start after the pre-pass calibration) — existence
      // alone would fire a warm-pass-early hold here, and a slow poll
      // can skip straight from warm_start to pass_rows_start
      def timedStarted(): Boolean =
        try Set("timed_start", "pass_rows_start")(
          new String(Files.readAllBytes(phase), "UTF-8"))
        catch { case _: Throwable => false }
      while (!timedStarted() && bench.isAlive) Thread.sleep(500)
      println(f"CONTPROBE timed pass began at " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s; holding load 8 s more")
      Thread.sleep(8000)
    } finally spinners.foreach(_.destroyForcibly())
    println("CONTPROBE foreign load drained; waiting for bench exit")
    bench.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    if (bench.isAlive) { bench.destroyForcibly(); sys.error("bench hung") }
    val detail = new String(Files.readAllBytes(
      tmp.resolve("bench_detail.json")), "UTF-8")
    def field(name: String, open: Char, close: Char): String = {
      val i = detail.indexOf("\"" + name + "\":")
      if (i < 0) return ""
      val s = detail.indexOf(open, i)
      var depth = 0; var j = s
      while (j < detail.length) {
        if (detail(j) == open) depth += 1
        else if (detail(j) == close) { depth -= 1
          if (depth == 0) return detail.substring(s, j + 1) }
        j += 1
      }
      ""
    }
    val fgn = field("fgn_queries", '{', '}')
    val reroll = field("reroll_trace", '[', ']')
    val suspect = field("suspect", '[', ']')
    println(s"CONTPROBE fgn_queries=$fgn")
    println(s"CONTPROBE reroll_trace=$reroll")
    println(s"CONTPROBE suspect=$suspect")
    "\"reroll_wait_sec\":([0-9.]+)".r.findFirstMatchIn(detail)
      .foreach(m => println(s"CONTPROBE reroll_wait_sec=${m.group(1)}"))
    val loudRows = "\"([a-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(fgn)
      .filter(_.group(2).toDouble > 2.0).map(_.group(1)).toList
    val rerolled = "\"q\":\"([a-z0-9_]+)\"".r.findAllMatchIn(reroll)
      .map(_.group(1)).toSet
    println(s"CONTPROBE loud_final=${loudRows.mkString(",")}")
    println(s"CONTPROBE rerolled=${rerolled.mkString(",")}")
    val verdict =
      if (rerolled.nonEmpty) "PASS: loud-window rows were re-rolled"
      else "FAIL: no row was re-rolled (load may have missed the pass)"
    println(s"CONTPROBE $verdict")
  }
}
