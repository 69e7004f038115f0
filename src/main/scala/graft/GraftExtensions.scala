package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.RollingHash64Expr

/** SparkSessionExtensions entry point: lets a deployment wire graft's
  * native expressions into every session at build time —
  *
  * ```
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic, or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ```
  *
  * (For an already-running session, [[functions.GraftFunctions.register]]
  * does the same registration imperatively.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64Expr].getName, "rolling_hash64"),
      (exprs: Seq[Expression]) => RollingHash64Expr(exprs.head)))
  }
}
