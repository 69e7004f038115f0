package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level lexical ranking: BM25 scoring of every document against
  * a fixed query-term set, with deterministic top-k selection.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - corpus statistics (N, avgdl, per-term document frequency) are ONE
  *    map-side-combined aggregation producing a single row — conditional
  *    counts per query term ride the same pass, so the number of query
  *    terms never adds scans;
  *  - the 1-row stats frame joins back by broadcast (crossJoin of a
  *    single row), keeping the scoring pass map-only and codegen'd;
  *  - top-k is orderBy+limit, which Spark plans as TakeOrderedAndProject
  *    (per-partition heaps + driver merge of k rows), never a global sort.
  */
object Ranking {

  /** Lucene-style BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)) — always
    * positive, so a term occurring in most docs still contributes.
    */
  private def idf(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5)))

  /** Score all docs against `terms`, keep docs matching at least one
    * term, and return the top `k` as (id, score) ordered by
    * (score DESC, id) — the id tiebreak makes the cut deterministic.
    * Scores are rounded to 4 decimals BEFORE ordering so the selection
    * is stable across evaluation orders and engines.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.size <= 64, s"query term list is ${terms.size}; this is " +
      "a per-query constant, not a column — keep it bounded")
    val toks = TextAnalysis.rawTokens(col(textCol))
    val base = docs.select(col(idCol), toks.as("_toks"),
      size(toks).as("_dl"))

    // one pass: corpus size, mean doc length, per-term doc frequency
    val aggs = Seq(
      count(lit(1)).as("_n_docs"),
      avg(col("_dl")).as("_avgdl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        count(when(array_contains(col("_toks"), t), 1)).as(s"_df_$i")
      }
    val stats = base.agg(aggs.head, aggs.tail: _*)

    val lenNorm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("_dl").cast("double") / col("_avgdl"))
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("_toks"), x => x === lit(t))).cast("double")
      idf(col("_n_docs").cast("double"), col(s"_df_$i").cast("double")) *
        (tf * lit(k1 + 1.0)) / (tf + lenNorm)
    }.reduce(_ + _)

    base.crossJoin(stats) // 1-row broadcast: scoring stays map-only
      .select(col(idCol), round(score, 4).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
