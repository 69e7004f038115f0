package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** The scoring/ordering kernel shared by [[NearestCentroidExpr]] (literal
  * quantizer) and [[NearestInCellExpr]] (row-carried quantizer). The
  * two-level SemDeDup hierarchy's correctness rests on the two argmaxes
  * agreeing BIT-FOR-BIT (NativeExprSpec pins it), so the pieces that
  * define the ordering live here exactly once — a fix applied to one
  * expression cannot silently miss the other (this round's NaN guard
  * had to land twice before this object existed).
  */
private[functions] object CosineArgmax {

  /** `round(x, 6)` replicating Spark's `Round`: HALF_UP via
    * `BigDecimal.valueOf`, with non-finite doubles passed through
    * unchanged (`BigDecimal.valueOf` would throw on them — a single
    * Inf/NaN element must not crash the job).
    */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Whether `(score, id)` beats the current best under the descending
    * struct-sort order both expressions mirror: `Double.compare` is
    * Spark's double sort order (NaN greatest), ties on the rounded
    * score resolve to the SMALLEST id (the `-cent_id` second sort key).
    */
  def wins(score: Double, id: Long,
           any: Boolean, bestScore: Double, bestId: Long): Boolean = {
    val cmp = java.lang.Double.compare(score, bestScore)
    !any || cmp > 0 || (cmp == 0 && id < bestId)
  }

  /** Lazy-rounding guard for the argmax loops: true iff `(round6(x),
    * id)` COULD beat or tie `(bestRounded, anyId)` — callers confirm
    * with the exact [[round6]] + [[wins]] pair. round6 is HALF_UP at
    * scale 6, so `round6(x) >= bestRounded` requires `x >= bestRounded
    * - 5e-7` exactly; skipping below `bestRounded - 6e-7` (an extra
    * 1e-7 of slack, orders of magnitude above double error at cosine
    * magnitudes |x| <= ~1) never skips a potential winner, and the
    * BigDecimal round evaluates only on running-max ascents and
    * near-ties instead of per candidate — the r13 probes measured the
    * per-pair `BigDecimal.valueOf` as a material share of every
    * assignment pass. NaN-safe: NaN comparisons are false, so NaN
    * scores (greatest in the sort order) always take the exact path.
    * Callers' scores are cosines (or their 0.0 guard) by contract —
    * the 1e-7 slack argument needs |x| small enough that FP
    * subtraction error stays below it.
    */
  def mightWin(x: Double, bestRounded: Double): Boolean =
    !(x < bestRounded - 6e-7)

  /** `round(x, 0)` with the same Round semantics as [[round6]] — used by
    * the int8 quantizer's code rounding.
    */
  def round0(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else JBigDecimal.valueOf(d).setScale(0, RoundingMode.HALF_UP).doubleValue()
}
