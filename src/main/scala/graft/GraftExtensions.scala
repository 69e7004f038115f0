package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductExpr, MinHashExpr, NormalizeNfcExpr,
  RollingHash64Expr, ShinglesExpr, SimHashExpr}

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
    def inject(name: String, clazz: Class[_],
               build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), build))

    inject("rolling_hash64", classOf[RollingHash64Expr],
      exprs => RollingHash64Expr(exprs.head))
    inject("normalize_nfc", classOf[NormalizeNfcExpr],
      exprs => NormalizeNfcExpr(exprs.head))
    inject("dot_product", classOf[DotProductExpr],
      exprs => DotProductExpr(exprs(0), exprs(1)))
    inject("simhash64", classOf[SimHashExpr],
      exprs => SimHashExpr(exprs.head))
    inject("tokens", classOf[graft.functions.TokensExpr],
      exprs => graft.functions.TokensExpr(exprs.head))
    inject("split_trim_tokens", classOf[graft.functions.TokenSplitExpr],
      exprs => graft.functions.TokenSplitExpr(exprs.head))
    // int literal second args: minhash(toks, k) / shingles(toks, n) /
    // top_gram_chars(toks, n)
    inject("minhash", classOf[MinHashExpr], exprs =>
      MinHashExpr(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("shingles", classOf[ShinglesExpr], exprs =>
      ShinglesExpr(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("top_gram_chars", classOf[graft.functions.TopGramCharsExpr], exprs =>
      graft.functions.TopGramCharsExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    inject("hashed_embed", classOf[graft.functions.HashedEmbedExpr], exprs =>
      graft.functions.HashedEmbedExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()))
  }
}
