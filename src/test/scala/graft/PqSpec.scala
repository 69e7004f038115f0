package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PqExprs.{pq_adc, pq_encode, pq_lut}
import graft.similarity.{Pq, Similarity}

/** Product-quantization ANN: expression parity against plain-Scala
  * reconstructions, training determinism, contract violations that must
  * THROW, measured recall floors, and the brute-force degeneracy of the
  * re-ranked pipeline (PqProbeMain grid in BASELINE.md carries the
  * recall measurements behind the registered geometry).
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val corpus =
    emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
  private lazy val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
  private lazy val model: Pq.PqModel = {
    val sample = graft.operators.Sampling
      .hashSample(corpus, col("c_id"), "8", "pq")
    Pq.train(sample, "c_id", "c_vec", m = 16, ksub = 16, iterations = 2)
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("q_id").cast("long"), col("c_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pq expressions match plain-Scala reconstructions bit-for-bit") {
    val rows = corpus.limit(50)
      .select(col("c_id"),
        col("c_vec"),
        pq_encode(col("c_vec"), model.codebooks, model.ksub).as("codes"),
        pq_lut(col("c_vec"), model.codebooks, model.ksub).as("lut"),
        pq_adc(pq_encode(col("c_vec"), model.codebooks, model.ksub),
          typedLit(model.sqNormLut)).as("sqn"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Number](1).map(_.doubleValue()).toArray
      val codes = r.getSeq[Int](2).toArray
      val lut = r.getSeq[Double](3).toArray
      val sqn = r.getDouble(4)
      // encode: per subspace, left-to-right L2 argmin, smallest code wins ties
      val expCodes = Array.tabulate(model.m) { s =>
        var best = 0.0; var bestC = 0
        (0 until model.ksub).foreach { c =>
          val cb = model.codebooks(s * model.ksub + c)
          var d = 0.0
          (0 until model.subDim).foreach { k =>
            val diff = v(s * model.subDim + k) - cb(k); d += diff * diff
          }
          if (c == 0 || d < best) { best = d; bestC = c }
        }
        bestC
      }
      assert(codes.toSeq === expCodes.toSeq, s"codes for c_id=${r.get(0)}")
      // lut: per (s, c), left-to-right dot of the query subvector
      val expLut = Array.tabulate(model.m * model.ksub) { i =>
        val s = i / model.ksub
        val cb = model.codebooks(i)
        var d = 0.0
        (0 until model.subDim).foreach { k =>
          d += v(s * model.subDim + k) * cb(k)
        }
        d
      }
      assert(lut.toSeq === expLut.toSeq, s"lut for c_id=${r.get(0)}")
      // adc over the sq-norm table = Σ ‖chosen sub-centroid‖²
      val expSqn = (0 until model.m)
        .map(s => model.sqNormLut(s * model.ksub + codes(s))).sum
      assert(sqn === expSqn, s"sqn for c_id=${r.get(0)}")
    }
  }

  test("training is bit-deterministic and moves the codebooks") {
    val sample = graft.operators.Sampling
      .hashSample(corpus, col("c_id"), "8", "pq")
    val again = Pq.train(sample, "c_id", "c_vec", m = 16, ksub = 16,
      iterations = 2)
    assert(model.codebooks.length === again.codebooks.length)
    model.codebooks.zip(again.codebooks).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    val seeds = Pq.train(sample, "c_id", "c_vec", m = 16, ksub = 16,
      iterations = 0)
    assert(model.codebooks.zip(seeds.codebooks)
      .exists { case (a, b) => !java.util.Arrays.equals(a, b) },
      "2 Lloyd iterations left every codebook entry at its seed")
  }

  test("dimension and geometry violations throw loudly") {
    import spark.implicits._
    // wrong-length vector into encode: must throw, not truncate
    val short = Seq((1L, Seq.fill(32)(0.5f))).toDF("c_id", "c_vec")
    val ex = intercept[Exception] {
      short.select(pq_encode(col("c_vec"), model.codebooks, model.ksub))
        .collect()
    }
    assert(ex.getMessage != null)
    // lut length not a multiple of the code count: must throw
    val bad = Seq((Seq(0, 1), Seq(0.1, 0.2, 0.3))).toDF("codes", "lut")
    intercept[Exception] {
      bad.select(pq_adc(col("codes"), col("lut"))).collect()
    }
    // code outside [0, ksub): must throw
    val oob = Seq((Seq(5), Seq(0.1, 0.2))).toDF("codes", "lut")
    intercept[Exception] {
      oob.select(pq_adc(col("codes"), col("lut"))).collect()
    }
    // a null vector ELEMENT would read as 0.0 from the unsafe array —
    // encode must throw, not encode a corrupted vector
    val nullElem = spark.sql(
      s"SELECT array(${Seq.fill(63)("0.5D").mkString(",")}, " +
        "CAST(NULL AS DOUBLE)) AS c_vec")
    intercept[Exception] {
      nullElem.select(pq_encode(col("c_vec"), model.codebooks, model.ksub))
        .collect()
    }
  }

  test("ADC scan and re-ranked pipeline clear their measured recall floors") {
    val encoded = Pq.encode(corpus, model)
    val exact = pairs(Similarity.bruteForceTopK(queries, corpus, k = 5))
    // raw ADC at 8 B/vector (PqProbeMain: 0.30 at sf0.01) — the scan
    // alone orders candidates usefully but is not the product surface
    val adc = pairs(Pq.topK(queries, encoded, model, k = 5))
    val adcRecall = (exact & adc).size.toDouble / exact.size
    assert(adcRecall >= 0.2, s"ADC recall $adcRecall under floor")
    // retrieve-then-rerank at rFactor=20 (the registered sim_pq_topk
    // shape; PqProbeMain: 1.00 at sf0.01, 0.86 at sf0.1)
    val refined = pairs(Pq.topKRefined(queries, encoded, corpus, model,
      k = 5, rFactor = 20))
    val refRecall = (exact & refined).size.toDouble / exact.size
    assert(refRecall >= 0.9, s"re-ranked recall $refRecall under floor")
  }

  test("IVFADC at full retrieve width equals the exact IVF probe") {
    import graft.operators.Sampling
    // same coarse quantizer recipe as the sim_ivf rows
    val stride = math.max(1, math.sqrt(corpus.count().toDouble).toLong)
    val seeds = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val sample = Sampling.hashSample(corpus, col("c_id"), "8", "pq")
    val cents = Similarity.trainIvfCentroids(sample, seeds, iterations = 2)
    val rModel = Pq.trainResidual(sample, cents, "c_id", "c_vec",
      m = 16, ksub = 16, iterations = 2)
    val index = Pq.ivfPqEncode(corpus, cents, rModel)
    // rFactor*k >= |corpus|: ADC ordering inside the probed buckets
    // stops mattering — every admitted candidate reaches the exact
    // re-rank, so the result IS the exact-scoring IVF probe: residual
    // quantization loses NOTHING the coarse probe admits
    val adc = Pq.ivfPqTopK(queries, index, cents, corpus, rModel,
      k = 5, nProbe = 3, rFactor = 100)
      .collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfProbe(queries,
      Similarity.buildIvfIndex(corpus, cents), cents, k = 5, nProbe = 3)
      .collect().map(_.toSeq).toSet
    assert(adc === ivf)
  }

  test("IVFADC shuffle-join probe path equals the broadcast path and " +
      "actually drops the broadcast hint") {
    import graft.operators.Sampling
    val stride = math.max(1, math.sqrt(corpus.count().toDouble).toLong)
    val seeds = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val sample = Sampling.hashSample(corpus, col("c_id"), "8", "pq")
    val cents = Similarity.trainIvfCentroids(sample, seeds, iterations = 2)
    val rModel = Pq.trainResidual(sample, cents, "c_id", "c_vec",
      m = 16, ksub = 16, iterations = 2)
    val index = Pq.ivfPqEncode(corpus, cents, rModel)
    def run(bc: Boolean) = Pq.ivfPqTopK(queries, index, cents, corpus,
      rModel, k = 5, nProbe = 3, rFactor = 10, broadcastProbes = bc)
    assert(run(false).collect().map(_.toSeq).toSet ===
      run(true).collect().map(_.toSeq).toSet)
    // the flag really changes the physical form of the PROBE join:
    // only the fallback repartitions on cent_id (other broadcasts —
    // centroids, rerank queries — exist on BOTH plans, so asserting
    // their presence/absence would be vacuous; and auto-broadcast is
    // disabled for the comparison so tiny test fixtures can't let
    // Spark re-broadcast the probe side behind the flag's back)
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thresholdKey)
    val (plan, bplan) =
      try {
        spark.conf.set(thresholdKey, "-1")
        (run(false).queryExecution.executedPlan.toString,
          run(true).queryExecution.executedPlan.toString)
      } finally spark.conf.set(thresholdKey, old)
    assert(plan.contains("hashpartitioning(cent_id"),
      s"fallback plan is not co-partitioned on cent_id:\n${plan.take(1500)}")
    assert(!bplan.contains("hashpartitioning(cent_id"),
      s"broadcast path unexpectedly shuffles on cent_id:\n${bplan.take(1500)}")
  }

  test("re-rank degenerates to exact brute force at full retrieve width") {
    val encoded = Pq.encode(corpus, model)
    // rFactor*k >= |corpus|: every candidate is retrieved, so the
    // re-ranker IS bruteForceTopK — same rows, same rounded scores
    val full = Pq.topKRefined(queries, encoded, corpus, model,
      k = 5, rFactor = 100)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .collect().map(_.toSeq).toSet
    assert(full === brute)
  }

  test("capped tie extension: a byte-equal code class far past the cap " +
      "still surfaces the right neighbor (min-id tie inside the cap)") {
    import spark.implicits._
    // 120 corpus rows share ONE vector (one byte-equal code class —
    // the replica-heavy shape the r13 cap bounds); a single distinct
    // distractor keeps training non-degenerate
    val base = Seq.tabulate(16)(i => 0.1 * (i % 5) + 0.05)
    val corpus = ((1L to 120L).map(id => (id, base)) :+
      (500L, base.map(-_))).toDF("c_id", "c_vec")
    val model = Pq.train(corpus, "c_id", "c_vec", m = 4, ksub = 2,
      iterations = 1)
    val encoded = Pq.encode(corpus, model)
    val queries = Seq((9000L, base.map(_ * 1.000001)))
      .toDF("q_id", "q_vec")
    val got = Pq.topKRefined(queries, encoded, corpus, model,
      k = 1, rFactor = 1).collect()
    assert(got.length === 1)
    // all class members re-rank to the same exact cosine; the c_id
    // tiebreak picks the smallest id, whose id-ordered slot is inside
    // the cap by construction — identical to uncapped behavior here
    assert(got.head.getLong(1) === 1L)
    val brute = Similarity.bruteForceTopK(queries, corpus, k = 1).collect()
    assert(got.head.getLong(1) === brute.head.getLong(1))
    assert(got.head.getDouble(2) === brute.head.getDouble(2))
  }

}
