package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** True merge-table byte-pair encoding — the exact-count upgrade over
  * [[TextAnalysis.bpeTokenCount]]'s pre-tokenizer regex proxy.
  *
  * Shape, which is the production shape: TRAINING runs driver-side on a
  * bounded deterministic sample of the corpus (this is how real
  * tokenizers are built — offline, on a sample; merge quality saturates
  * long before corpus size does), and ENCODING runs as one map-only
  * distributed pass with the ranked merge table shipped in the task
  * closure (dimension-sized: `numMerges` string pairs). At 100 TB the
  * training cost is a constant and the encode adds zero shuffles.
  *
  * Algorithm (Sennrich et al. 2016, GPT-2 variant): texts pre-tokenize
  * with [[TextAnalysis.bpePattern]] (so proxy and exact counts share
  * the same word boundary definition, and exact >= proxy always —
  * merges only ever fuse symbols WITHIN a pre-token); each pre-token
  * starts as a character sequence; training repeatedly merges the most
  * frequent adjacent symbol pair (ties broken lexicographically for
  * determinism), recording pairs in rank order; encoding greedily
  * applies the lowest-ranked applicable merge until none applies.
  * Two symbol alphabets (`byteLevel`): char-level (default — each
  * codepoint a symbol; one unseen in training encodes as itself) and
  * the GPT-2 BYTE alphabet (r16, [[byteToChar]]) where every pre-token
  * decomposes to UTF-8 bytes mapped to 256 printable chars — no
  * codepoint is ever outside the alphabet, so exact token counts match
  * a production GPT-2/cl100k-style tokenizer's behavior on non-Latin
  * corpora ([[byteDecode]] round-trips, spec-pinned).
  *
  * The encode step is genuinely iterative per word — the documented UDF
  * boundary (preference order in SURVEY §2.8: builtins > native
  * expression > UDF; an inner while-loop over a rank table has no
  * builtin form, and a native expression would still run the same JVM
  * loop). It is map-only, fuses with the scan, and shuffles nothing.
  */
object Bpe {

  /** Ranked merges: index = rank (lower merges first). */
  type Merges = Seq[(String, String)]

  private val preTokenRe = TextAnalysis.bpePattern.r

  /** Pre-tokenize exactly like the proxy counter (same regex, same
    * non-overlapping left-to-right semantics).
    */
  def preTokenize(text: String): Seq[String] =
    if (text == null) Nil else preTokenRe.findAllIn(text).toSeq

  // ------------------------------------------------ byte-level alphabet
  /** GPT-2's byte→unicode table (r16 — the byte fallback mode): every
    * UTF-8 byte maps to a PRINTABLE unicode char — printable bytes
    * ('!'..'~', '¡'..'¬', '®'..'ÿ') to themselves, the rest to 256+n in
    * first-free order — so the symbol alphabet is exactly 256 chars and
    * EVERY codepoint is representable as a byte sequence. This is the
    * public bytes_to_unicode construction from the GPT-2 release
    * (Radford et al. 2019, encoder.py), re-derived from its published
    * description; cl100k/o200k tokenizers keep the same byte-level
    * foundation. In byte mode no codepoint is ever outside the training
    * alphabet — the char-mode divergence this closes (a codepoint
    * unseen in training encodes as itself there).
    */
  private[graft] val byteToChar: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  private[graft] lazy val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, i) => c -> i }.toMap

  /** A pre-token as byte-alphabet symbols (one per UTF-8 byte). */
  private def byteSymbols(word: String): Array[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToChar(b & 0xff).toString)

  private def charSymbols(word: String): Array[String] =
    word.map(_.toString).toArray

  /** Decode byte-mode tokens back to text — the round-trip proof
    * (spec-pinned): concatenated tokens map char-by-char back to UTF-8
    * bytes, which decode to exactly the pre-token stream.
    */
  def byteDecode(tokens: Seq[String]): String =
    new String(
      tokens.flatMap(_.map(c => charToByte(c).toByte)).toArray,
      java.nio.charset.StandardCharsets.UTF_8)

  /** Train `numMerges` merges from a corpus sample, driver-side.
    *
    * The sample is deterministic on data content (top `sampleDocs` rows
    * by xxhash64 of the text — a content-ordered slice, independent of
    * partitioning/cluster layout) and bounded, so training cost is a
    * constant regardless of corpus size. Stops early when no adjacent
    * pair repeats (count < 2): merging a count-1 pair memorizes noise.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            sampleDocs: Int = 512, byteLevel: Boolean = false): Merges = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(sampleDocs > 0, s"sampleDocs must be positive, got $sampleDocs")
    val sample = df
      .select(col(textCol).cast("string").as("t"))
      .filter(col("t").isNotNull)
      .orderBy(xxhash64(col("t")), col("t")) // TakeOrdered: scale-safe
      .limit(sampleDocs)
      .collect().map(_.getString(0))
    trainLocal(sample, numMerges, byteLevel)
  }

  /** The driver-side trainer, exposed for specs. */
  def trainLocal(texts: Seq[String], numMerges: Int,
                 byteLevel: Boolean = false): Merges = {
    // word frequencies over pre-tokens
    val wordFreq = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(t => preTokenize(t).foreach(w =>
      wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L)))
    trainFreqs(wordFreq, numMerges, byteLevel)
  }

  /** Train merges from WHOLE-CORPUS pre-token frequencies — the
    * distributed form of [[train]]: counting is one explode+groupBy
    * shuffle over the corpus, and the merge loop then runs driver-side
    * over the DISTINCT-WORD frequency table cut to `maxWords` — a
    * vocab-bounded driver read (a natural-language corpus has ~10^6
    * distinct pre-tokens no matter how many TB of text it is), taken
    * by (freq desc, word) through sort+limit so the plan is
    * TakeOrdered, never a full sort. [[train]]'s bounded sample answers
    * "a good tokenizer, at constant cost"; this answers "THE tokenizer
    * of this corpus" — exact global pair statistics (within the vocab
    * cut) — at one shuffle. Same regex both paths: the column form's
    * `regexp_extract_all` and the driver's [[preTokenize]] compile the
    * identical Java pattern, so a word counts the same either way.
    */
  def trainCorpus(df: DataFrame, textCol: String, numMerges: Int,
                  maxWords: Int = 65536,
                  byteLevel: Boolean = false): Merges = {
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val wf = df
      .select(explode(regexp_extract_all(
        col(textCol).cast("string"),
        lit(TextAnalysis.bpePattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")) // + limit = TakeOrdered
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val m = new scala.collection.mutable.HashMap[String, Long]()
    wf.foreach { case (w, n) => m.update(w, n) }
    trainFreqs(m, numMerges, byteLevel)
  }

  /** The merge loop proper, over a (pre-token -> frequency) table —
    * shared by the sampled ([[trainLocal]]) and whole-corpus
    * ([[trainCorpus]]) trainers.
    */
  private def trainFreqs(
      wordFreq: scala.collection.mutable.HashMap[String, Long],
      numMerges: Int, byteLevel: Boolean = false): Merges = {
    val symbolize: String => Array[String] =
      if (byteLevel) byteSymbols else charSymbols
    // each distinct word as a mutable symbol sequence
    var words: Array[(Array[String], Long)] = wordFreq.iterator
      .map { case (w, f) => (symbolize(w), f) }.toArray
      .sortBy(_._1.mkString) // deterministic, unique per word
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var continue = true
    while (i < numMerges && continue) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          j += 1
        }
      }
      // max count, ties to the lexicographically smallest pair
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) => acc match {
          case Some((bp, bc)) if c < bc => acc
          case Some((bp, bc)) if c == bc &&
            Ordering[(String, String)].lteq(bp, p) => acc
          case _ => Some((p, c))
        }
      }
      best match {
        case Some((pair, cnt)) if cnt >= 2 =>
          merges += pair
          val fused = pair._1 + pair._2
          words = words.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val out = scala.collection.mutable.ArrayBuffer[String]()
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 &&
                  syms(j) == pair._1 && syms(j + 1) == pair._2) {
                  out += fused; j += 2
                } else { out += syms(j); j += 1 }
              }
              (out.toArray, f)
            }
          }
          i += 1
        case _ => continue = false
      }
    }
    merges.result()
  }

  /** Greedy BPE encode of one pre-token: repeatedly apply the
    * lowest-ranked adjacent merge (leftmost on equal rank) until no
    * adjacent pair is in the table.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int],
                 byteLevel: Boolean = false): Seq[String] = {
    var syms: Vector[String] =
      if (byteLevel) byteSymbols(word).toVector
      else word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        ranks.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Full-text encode: pre-tokenize, encode each pre-token. The token
    * concatenation reproduces the pre-token stream exactly (merges never
    * cross word boundaries), so `encode(t).mkString == preTokenize(t)
    * .mkString` — pinned by spec.
    */
  def encode(text: String, ranks: Map[(String, String), Int],
             byteLevel: Boolean = false): Seq[String] =
    preTokenize(text).flatMap(w => encodeWord(w, ranks, byteLevel))

  def ranksOf(merges: Merges): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Column forms — map-only; the ranked table rides the task closure
    * (dimension-sized). */
  def bpeEncode(c: Column, merges: Merges,
                byteLevel: Boolean = false): Column = {
    val ranks = ranksOf(merges)
    udf((t: String) =>
      if (t == null) null else encode(t, ranks, byteLevel)).apply(c)
  }

  def bpeExactCount(c: Column, merges: Merges,
                    byteLevel: Boolean = false): Column = {
    val ranks = ranksOf(merges)
    udf((t: String) =>
      if (t == null) 0 else encode(t, ranks, byteLevel).size).apply(c)
  }

  /** Memoized per-(session, dir) training for harness queries: repeated
    * Bench/Verify invocations of the same query reuse one driver-side
    * training run. Freshness contract: identity keying per [[graft.Memo]].
    */
  private val trainCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String, Int, Int, Boolean), Merges]()

  def trainCached(spark: SparkSession, dir: String, df: => DataFrame,
                  textCol: String, numMerges: Int,
                  sampleDocs: Int = 512,
                  byteLevel: Boolean = false): Merges = {
    graft.Memo.maintain(trainCache)(_._1)
    trainCache.computeIfAbsent(
      (spark, dir, textCol, numMerges, sampleDocs, byteLevel),
      _ => train(df, textCol, numMerges, sampleDocs, byteLevel))
  }
}
