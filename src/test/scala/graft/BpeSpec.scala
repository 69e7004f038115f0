package graft

import graft.text.{Bpe, TextAnalysis}
import org.apache.spark.sql.functions._

/** True-BPE trainer/encoder semantics, hand-verified (graft.text.Bpe). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training merges the most frequent pair first, hand-computed") {
    // words: abab x2, abc x1 -> pair (a,b) count 5 merges first; then
    // (ab,ab) count 2; then (ab,c) count 1 stops training (no repeat)
    val merges = Bpe.trainLocal(Seq("abab", "abab", "abc"), numMerges = 10)
    assert(merges === Seq(("a", "b"), ("ab", "ab")))
  }

  test("tie on counts resolves to the lexicographically smallest pair") {
    val merges = Bpe.trainLocal(Seq("ab", "ab", "cd", "cd"), numMerges = 1)
    assert(merges === Seq(("a", "b")))
  }

  test("training is deterministic under input order and partition layout") {
    val texts = Seq("the theme there", "other gather the", "breathe the")
    val a = Bpe.trainLocal(texts, 50)
    val b = Bpe.trainLocal(texts.reverse, 50)
    assert(a === b)
  }

  test("greedy encode applies lowest rank first; roundtrip reproduces text") {
    val ranks = Bpe.ranksOf(Seq(("a", "b"), ("ab", "ab")))
    assert(Bpe.encodeWord("ababab", ranks) === Seq("abab", "ab"))
    assert(Bpe.encodeWord("abc", ranks) === Seq("ab", "c"))
    assert(Bpe.encodeWord("xyz", ranks) === Seq("x", "y", "z"))
    // full text: pre-tokenization boundaries (incl. GPT-2 leading-space
    // convention and punctuation runs) survive the merge loop exactly
    val t = "abab abc, it's 42!"
    val toks = Bpe.encode(t, ranks)
    assert(toks.mkString === Bpe.preTokenize(t).mkString)
  }

  test("byte-level mode (r16): alphabet bijective, round-trip exact on " +
      "non-Latin text, no codepoint ever outside the alphabet, and " +
      "merges compress multi-byte scripts char-mode cannot touch") {
    // the GPT-2 byte<->char table is a bijection over all 256 bytes
    val chars = graft.text.Bpe.byteToChar
    assert(chars.length === 256 && chars.toSet.size === 256)
    assert(chars('!'.toInt) === '!' && chars('~'.toInt) === '~')
    (0 until 256).foreach(b =>
      assert(graft.text.Bpe.charToByte(chars(b)) === b))
    // round-trip: byte-mode tokens decode to EXACTLY the pre-token
    // stream, for ASCII, accented, Cyrillic, CJK and an emoji (a
    // 4-byte codepoint — surrogate pair in the char-mode alphabet)
    val t = "héllo мир 日本語 ok! 🙂"
    val merges = Bpe.trainLocal(Seq(t, t, t, "plain ascii text"),
      numMerges = 30, byteLevel = true)
    val ranks = Bpe.ranksOf(merges)
    val toks = Bpe.encode(t, ranks, byteLevel = true)
    assert(Bpe.byteDecode(toks) === Bpe.preTokenize(t).mkString)
    // every emitted symbol decomposes entirely within the byte alphabet
    toks.foreach(tok => tok.foreach(c =>
      assert(graft.text.Bpe.charToByte.contains(c), s"alien symbol $tok")))
    // the repeated non-Latin words actually merged: fewer tokens than
    // UTF-8 bytes (char mode can also merge seen codepoints — the byte
    // mode's distinct claim is coverage, asserted above: an UNSEEN
    // codepoint still decomposes into in-alphabet bytes)
    val nBytes = t.getBytes("UTF-8").length
    assert(toks.size < nBytes, s"${toks.size} !< $nBytes")
    // unseen codepoint: encodes through bytes, round-trips exactly
    val unseen = "中文"
    val utoks = Bpe.encode(unseen, ranks, byteLevel = true)
    assert(Bpe.byteDecode(utoks) === unseen)
    utoks.foreach(tok => tok.foreach(c =>
      assert(graft.text.Bpe.charToByte.contains(c))))
    // byte-mode trainer is as deterministic as char mode
    assert(Bpe.trainLocal(Seq(t, t, t, "plain ascii text"),
      numMerges = 30, byteLevel = true) === merges)
  }

  test("whole-corpus trainer equals the driver trainer when the vocab " +
      "cut covers every word, and the cut keeps the top words") {
    val texts = Seq("the theme there other", "gather the breathe",
      "the zoo zebra", "it's 42! abab abc")
    val df = texts.toDF("text").repartition(3) // layout-independence too
    val full = Bpe.trainCorpus(df, "text", numMerges = 50,
      maxWords = 100000)
    assert(full === Bpe.trainLocal(texts, 50))
    assert(full.nonEmpty)
    // a top-1 cut trains only on the most frequent pre-token — "the"
    // (x2: both line-leading occurrences; every other word appears once
    // or carries the leading-space form). Hand-computed merge sequence
    // over {"the": 2}: (t,h) and (h,e) tie at 2 -> lexicographically
    // smallest (h,e) first; then (t,he) at 2; then "the" is one symbol
    // and training stops. Layout-independent like the full table.
    val cut = Bpe.trainCorpus(df, "text", numMerges = 50, maxWords = 1)
    assert(cut === Seq(("h", "e"), ("t", "he")))
    assert(cut === Bpe.trainCorpus(df.repartition(7), "text", 50, 1))
    intercept[IllegalArgumentException] {
      Bpe.trainCorpus(df, "text", numMerges = 1, maxWords = 0)
    }
  }

  test("exact count >= proxy count on the harness corpus (column forms)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(docs, "text", numMerges = 64)
    assert(merges.nonEmpty)
    val bad = docs.select(
        Bpe.bpeExactCount($"text", merges).as("exact"),
        TextAnalysis.bpeTokenCount($"text").as("proxy"))
      .filter($"exact" < $"proxy").count()
    // merges fuse only within a pre-token, so exact can never undercut
    // the pre-token (proxy) count
    assert(bad === 0L)
    // and training must actually compress: strictly fewer exact tokens
    // than characters somewhere
    val sums = docs.select(
      sum(Bpe.bpeExactCount($"text", merges)).cast("long"),
      sum(length($"text")).cast("long")).head()
    assert(sums.getLong(0) < sums.getLong(1))
  }
}
