package graft.functions

import scala.collection.immutable.TreeSet

/** Pure token-set algebra behind the two merge operators:
  *
  *  - A4 WITH_INFO consolidation: sorted-set union of `[|,]`-delimited
  *    tokens, re-fragmented into chunks of <= 1700 chars at `|`
  *    boundaries (WithInfoConsolidator.java:9-143; hard-cut of oversized
  *    single tokens per changes.txt:1-2);
  *  - A2 XREF_SOURCE merge with 4000-char overflow: emit-and-restart
  *    when the merged serialized form would exceed the cap
  *    (MAHDL.java:84-125).
  *
  * All functions are deterministic given input order; callers sort
  * candidates first (the reference's parallel order is nondeterministic —
  * SURVEY.md §7.3 mandates documented determinism instead).
  */
object TokenOps {

  /** `[|,]` split, trim, drop empties (WithInfoConsolidator.java:69-76). */
  def splitTokens(s: String): Seq[String] =
    if (s == null) Seq.empty
    else s.split("[|,]").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  def sortedDistinct(tokens: Iterable[String]): Seq[String] =
    TreeSet.from(tokens).toSeq

  /** Serialized length of a `|`-joined token list. */
  private def joinedLen(tokens: Seq[String]): Int =
    if (tokens.isEmpty) 0 else tokens.map(_.length).sum + tokens.size - 1

  /** Pack sorted tokens into `|`-joined fragments of <= cap chars,
    * preferring `|` boundaries; a single token longer than cap is
    * hard-cut into cap-sized pieces.
    */
  def fragment(tokens: Seq[String], cap: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { out += cur.result(); cur.clear() }
    tokens.foreach { t0 =>
      val pieces = if (t0.length <= cap) Seq(t0) else t0.grouped(cap).toSeq
      pieces.foreach { t =>
        val extra = if (cur.isEmpty) t.length else t.length + 1
        if (cur.length + extra > cap) flush()
        if (cur.nonEmpty) cur += '|'
        cur ++= t
      }
    }
    flush()
    out.result()
  }

  /** One A2 input candidate (already reduced to the two merge payloads). */
  final case class XrefCand(xref: String, notes: String)

  /** One A2 output: merged xref + merged notes. */
  final case class XrefMerged(xref: String, notes: String)

  /** A2 merge: candidates (pre-sorted by caller) are folded left;
    * XREF_SOURCE tokens accumulate as a sorted set; if the serialized
    * set would exceed `cap`, the accumulation-so-far is emitted and a
    * fresh one started (MAHDL.java:89-101). NOTES accumulates note
    * tokens minus xref tokens (`array_except` analog of
    * `notes.removeAll(xrefSource)`, MAHDL.java:105-107) plus the
    * parenthesized original xref of any candidate containing a PMID
    * (README.md:18-20).
    */
  def mergeXref(cands: Seq[XrefCand], cap: Int): Seq[XrefMerged] = {
    val out = Seq.newBuilder[XrefMerged]
    var xrefs = TreeSet.empty[String]
    var notes = TreeSet.empty[String]
    var pmidGroups = TreeSet.empty[String]
    var pending = false // candidates consumed since the last flush

    def render(): XrefMerged = {
      val noteTokens = (notes -- xrefs).toSeq ++ pmidGroups.toSeq
      XrefMerged(xrefs.mkString("|"), noteTokens.mkString("|"))
    }
    def flush(): Unit = {
      // one output per consumed accumulation, even when every payload was
      // empty — a group of all-empty candidates must still yield its
      // annotation, not vanish (the reference keeps the bucket's
      // annotation regardless of xref content, MAHDL.java:57-67)
      if (pending) out += render()
      xrefs = TreeSet.empty; notes = TreeSet.empty; pmidGroups = TreeSet.empty
      pending = false
    }

    cands.foreach { c =>
      val ts = splitTokens(c.xref)
      val grown = xrefs ++ ts
      if (xrefs.nonEmpty && joinedLen(grown.toSeq) > cap) flush()
      pending = true
      xrefs = xrefs ++ ts
      notes = notes ++ splitTokens(c.notes)
      // any candidate whose xref contains a PMID contributes its
      // parenthesized ORIGINAL token group (MAHDL.java:109-111 gates on
      // contains("PMID") with no token-count condition; README note 4's
      // "multiple PMIDs" describes the merged field, not the gate) —
      // rendered here as the candidate's sorted distinct tokens for
      // deterministic output (SURVEY.md §7.3)
      if (c.xref != null && c.xref.contains("PMID"))
        pmidGroups += s"(${sortedDistinct(ts).mkString("|")})"
    }
    flush()
    out.result()
  }
}
