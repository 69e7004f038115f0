package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared token/gram primitives for the native n-gram expressions
  * ([[ShinglesExpr]], [[TopGramCharsExpr]]): one definition of "gram
  * text" so the dup-fraction gram set and the top-gram mass computed in
  * the same repetitionStats projection can never diverge.
  */
private[functions] object GramOps {

  /** Token array out of the Catalyst array (nulls preserved). */
  def tokens(input: ArrayData): Array[String] = {
    val len = input.numElements()
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (input.isNullAt(i)) null else input.getUTF8String(i).toString
      i += 1
    }
    toks
  }

  /** The n-gram starting at `i`, space-joined with null tokens skipped —
    * `array_join(slice(...), " ")` semantics.
    */
  def gram(toks: Array[String], i: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder()
    var j = 0
    var first = true
    while (j < n) {
      val t = toks(i + j)
      if (t != null) {
        if (!first) sb.append(' ')
        sb.append(t)
        first = false
      }
      j += 1
    }
    sb.toString
  }
}
