package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking for context-length-bounded training
  * (the `return_overflowing_tokens` shape: fixed window, fixed stride,
  * stride < window => overlapping chunks).
  *
  * Scale: map-only. Tokenization, window-start generation, and slicing
  * are codegen'd column expressions; the explode is a Generate with no
  * shuffle, so throughput is linear in corpus bytes and parallel per
  * input split — the same single-pass shape as the corpus-QC ops.
  * Output growth is bounded by ceil(n_tokens / stride) chunks per doc.
  */
object Chunker {

  /** Cut each doc's token stream into windows of `width` tokens whose
    * starts advance by `stride`. Chunks are emitted for every start in
    * {0, stride, 2*stride, ...} < n_tokens, so the final chunk may be
    * shorter than `width`; empty/whitespace-only docs yield no chunks.
    * Tokenization is [[TextAnalysis.rawTokens]] — the engine-wide
    * whitespace tokenizer, so chunk token counts agree with
    * [[TextAnalysis.tokenCount]] and the packing/repetition ops.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    width: Int, stride: Int): DataFrame = {
    require(width > 0, s"chunk width must be positive, got $width")
    require(stride > 0, s"chunk stride must be positive, got $stride")
    val toks = TextAnalysis.rawTokens(col(textCol))
    val nTok = size(col("_toks"))
    val starts = when(nTok > 0, sequence(lit(0), nTok - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    val chunk = slice(col("_toks"), col("_start") + 1, lit(width))
    df.select(col(idCol), toks.as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(starts).as(Seq("chunk_id", "_start")))
      .select(col(idCol), col("chunk_id"),
        size(chunk).as("n_chunk_tokens"),
        array_join(chunk, " ").as("chunk_text"))
  }
}
