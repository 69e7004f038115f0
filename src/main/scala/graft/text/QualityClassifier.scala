package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style linear quality classifier over hashed token features —
  * the statistical filter the GPT-3 / LLaMA pipelines run after
  * rule-based QC: train a cheap linear model on labeled examples (in
  * practice the labels are a proxy: docs a trusted heuristic or a
  * reference corpus calls "good"), then score the whole corpus with a
  * model small enough to ship to every executor.
  *
  * Feature map (shared EXACTLY between training and scoring because the
  * training featurization runs through the same Spark expressions):
  * lowercased whitespace tokens, each hashed by `xxhash64` into one of
  * `dim` buckets; a document's feature vector is the bucket-count
  * vector scaled by 1/n_tokens (the fastText mean). The classifier is
  * logistic: score = sigmoid(b + w·x).
  *
  * Scale shape at 100 TB:
  *  - TRAINING is bounded by design: featurized examples are collected
  *    to the driver (loud cap — a quality classifier is trained on a
  *    curated sample of 1e4..1e6 docs, never the corpus) and fitted
  *    with full-batch gradient descent in a fixed example order, so the
  *    learned weights are bit-deterministic for a given sample;
  *  - SCORING is the part that must scale, and it is map-only with zero
  *    shuffles: the weight vector is a broadcast literal and the dot
  *    product folds weight lookups over the token array
  *    (`aggregate(tokens, 0, (acc, t) -> acc + w[h(t)])`) — no feature
  *    vector is ever materialized, no join, nothing leaves the scan
  *    pass.
  *
  * This mirrors how CCNet/fastText deploy: model fits in L2, corpus
  * streams past it. The reference pipeline has no statistical scoring
  * (rule-based field filters only) — LLM-curation extension family.
  */
object QualityClassifier {

  /** Hard cap on collected training examples (sparse index lists, so
    * driver memory is ~tokens-per-doc × cap longs ≈ low hundreds MB).
    */
  val maxTrainExamples = 200000L

  case class Model(dim: Int, bias: Double, weights: Array[Double]) {
    require(weights.length == dim, s"weights ${weights.length} != dim $dim")
  }

  /** 1-based feature bucket of one token (element_at indexing). */
  private def bucket(tok: Column, dim: Int): Column =
    pmod(xxhash64(tok), lit(dim)).cast("int") + lit(1)

  /** The per-doc hashed-feature index list — the single featurization
    * definition train() and score() both consume.
    */
  private def featureIdx(text: Column, dim: Int): Column =
    transform(TextAnalysis.rawTokens(lower(text)), t => bucket(t, dim))

  /** Fit a logistic model on (textCol, labelCol∈{0,1}) examples with
    * full-batch gradient descent (`iters` steps, rate `lr`). Examples
    * are featurized distributively, then collected (bounded by
    * [[maxTrainExamples]] — loud failure beyond it) and processed in
    * ascending-id order so training is deterministic under any
    * partitioning. Weights are rounded to 9 decimals so downstream
    * digests don't ride the last float ulp.
    */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int = 4096, iters: Int = 30,
            lr: Double = 0.5): Model = {
    val n = labeled.count()
    require(n > 0, "empty training set")
    require(n <= maxTrainExamples,
      s"$n training examples exceed the $maxTrainExamples driver cap — " +
        "train a quality classifier on a curated sample, not a corpus " +
        "(Sampling.hashSample is the deterministic way to cut one)")
    val rows = labeled
      .select(col(idCol), featureIdx(col(textCol), dim).as("_f"),
        col(labelCol).cast("double").as("_y"))
      .filter(size(col("_f")) > 0)
      .orderBy(col(idCol))
      .collect()
    val xs = rows.map(_.getAs[scala.collection.Seq[Int]]("_f").toArray)
    val ys = rows.map(_.getAs[Double]("_y"))
    val w = new Array[Double](dim)
    var b = 0.0
    val m = xs.length.toDouble
    for (_ <- 1 to iters) {
      val gw = new Array[Double](dim)
      var gb = 0.0
      var i = 0
      while (i < xs.length) {
        val f = xs(i)
        val inv = 1.0 / f.length
        var z = b
        var j = 0
        while (j < f.length) { z += w(f(j) - 1) * inv; j += 1 }
        val err = 1.0 / (1.0 + math.exp(-z)) - ys(i)
        gb += err
        j = 0
        while (j < f.length) { gw(f(j) - 1) += err * inv; j += 1 }
        i += 1
      }
      b -= lr * gb / m
      var k = 0
      while (k < dim) { w(k) -= lr * gw(k) / m; k += 1 }
    }
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    Model(dim, r9(b), w.map(r9))
  }

  /** Map-only scoring column: sigmoid(b + w·x) rounded to 6 decimals,
    * null-token docs score sigmoid(b). r10: the hash+fold is the native
    * codegen'd [[graft.functions.LogitScoreExpr]] (one pass over the
    * token array; the HOF pair it replaces evaluated interpreted per
    * token — bit-parity pinned in NativeExprSpec against
    * [[scoreColumnHof]]). The weights ride inside the expression, so
    * the plan still serializes one literal copy.
    */
  def scoreColumn(text: Column, model: Model): Column = {
    val mean = graft.functions.LogitScoreExpr.logit_mean(
      TextAnalysis.rawTokens(lower(text)), model.weights.toSeq)
    // null text -> null tokens -> null mean; coalesce preserves the
    // sigmoid(bias) contract the HOF's otherwise-branch provided
    val z = lit(model.bias) + coalesce(mean, lit(0.0))
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** The pre-r10 higher-order-function scoring form — retained as the
    * PARITY REFERENCE the native expression is pinned against (same
    * convention as TextAnalysis.hashedEmbeddingsHof). Not for
    * production: both lambdas evaluate interpreted per token.
    */
  private[graft] def scoreColumnHof(text: Column, model: Model): Column = {
    val wLit = typedLit(model.weights.toSeq)
    val idx = featureIdx(text, model.dim)
    val z = lit(model.bias) +
      when(size(idx) > 0,
        aggregate(idx, lit(0.0),
          (acc, i) => acc + element_at(wLit, i)) / size(idx))
        .otherwise(lit(0.0))
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Score a corpus: (id, quality_prob, keep = prob >= threshold). */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model,
            threshold: Double = 0.5): DataFrame =
    docs.select(col(idCol),
      scoreColumn(col(textCol), model).as("quality_prob"))
      .withColumn("keep", col("quality_prob") >= threshold)
}
