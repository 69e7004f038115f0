package graft.util

/** Env-gated wall-clock tracing shared by the pipeline/ops debug
  * switches (GRAFT_RUNNER_TIMING, GRAFT_COUNTER_DEBUG,
  * GRAFT_STREAM_DEBUG, ...) — one definition so the gate semantics and
  * output shape can't drift per call site. Zero cost when the env var
  * is unset beyond the Boolean check.
  */
object Debug {

  /** Time `f`, printing `<prefix> <name> <secs>` to stderr when
    * `enabled`; `epoch` (nanoTime) adds an `@elapsed` column for
    * tracing position within a larger run.
    */
  def timed[T](enabled: Boolean, prefix: String, name: String,
               epoch: Long = 0L)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      val at = if (epoch == 0L) ""
        else f"  @${(System.nanoTime() - epoch) / 1e9}%6.2f"
      System.err.println(
        f"$prefix $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs$at")
      r
    }
}
