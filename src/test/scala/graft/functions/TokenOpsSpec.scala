package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TokenOps._

class TokenOpsSpec extends AnyFunSuite {

  test("splitTokens splits on pipe and comma, trims, drops empties") {
    assert(splitTokens("a|b,c") === Seq("a", "b", "c"))
    assert(splitTokens(" a | , b ") === Seq("a", "b"))
    assert(splitTokens(null) === Seq.empty)
    assert(splitTokens("") === Seq.empty)
  }

  test("fragment packs at pipe boundaries under the cap") {
    // cap 7: "aa|bb" (5) fits, adding "|cc" would make 8 -> new fragment
    assert(fragment(Seq("aa", "bb", "cc"), 7) === Seq("aa|bb", "cc"))
  }

  test("fragment hard-cuts a single token exceeding the cap (changes.txt:1-2)") {
    assert(fragment(Seq("abcdefghij"), 4) === Seq("abcd", "efgh", "ij"))
  }

  test("fragment of fitting input is identity-ish") {
    assert(fragment(Seq("a", "b"), 1700) === Seq("a|b"))
  }

  test("fragment never exceeds cap and round-trips the token set (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val toks0 = Seq.fill(rnd.nextInt(40))(
        rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString)
      val cap = 5 + rnd.nextInt(195)
      val toks = sortedDistinct(toks0)
      val frags = fragment(toks, cap)
      assert(frags.forall(_.length <= cap))
      // round-trip holds when no token was hard-cut
      if (toks.forall(_.length <= cap))
        assert(frags.flatMap(splitTokens).toSet === toks.toSet)
    }
  }

  test("mergeXref round-trips the full xref token set across emitted rows (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val cands = Seq.fill(1 + rnd.nextInt(10))(XrefCand(
        Seq.fill(1 + rnd.nextInt(5))("PMID:" + rnd.nextInt(50)).mkString("|"),
        null)).sortBy(_.xref)
      val cap = 20 + rnd.nextInt(100)
      val out = mergeXref(cands, cap)
      val inTokens = cands.flatMap(c => splitTokens(c.xref)).toSet
      val outTokens = out.flatMap(m => splitTokens(m.xref)).toSet
      assert(inTokens === outTokens)
    }
  }

  test("mergeXref unions sorted-distinct tokens below the cap") {
    val out = mergeXref(Seq(
      XrefCand("GO_REF:1|PMID:2", "note1"),
      XrefCand("PMID:2,PMID:3", "note1|extra")), cap = 4000)
    assert(out.size === 1)
    assert(out.head.xref === "GO_REF:1|PMID:2|PMID:3")
    // notes minus xref tokens, plus parenthesized multi-token PMID groups
    assert(out.head.notes.contains("extra"))
    assert(out.head.notes.contains("note1"))
    assert(!out.head.notes.split("[|]").contains("PMID:2"))
    assert(out.head.notes.contains("(GO_REF:1|PMID:2)"))
    assert(out.head.notes.contains("(PMID:2|PMID:3)"))
  }

  test("mergeXref emits and restarts on overflow (MAHDL.java:89-101)") {
    // cap 15: "PMID:1|PMID:2" = 13 fits, adding PMID:3 -> 20 > 15
    val out = mergeXref(Seq(
      XrefCand("PMID:1", null), XrefCand("PMID:2", null),
      XrefCand("PMID:3", null)), cap = 15)
    assert(out.size === 2)
    assert(out(0).xref === "PMID:1|PMID:2")
    assert(out(1).xref === "PMID:3")
  }

  test("mergeXref of all-empty candidates still emits one (empty) row") {
    // regression: a group whose xref AND notes are all empty must not
    // vanish — it still represents one annotation (found via the
    // chinchilla manual-annotation path, which has no db_reference)
    assert(mergeXref(Seq(XrefCand(null, null)), 4000) ===
      Seq(XrefMerged("", "")))
    assert(mergeXref(Seq(XrefCand("", ""), XrefCand(null, null)), 4000) ===
      Seq(XrefMerged("", "")))
  }

  test("mergeXref is deterministic for pre-sorted input") {
    val cands = Seq(XrefCand("b", "y"), XrefCand("a", "x")).sortBy(_.xref)
    assert(mergeXref(cands, 4000) === mergeXref(cands, 4000))
  }
}
