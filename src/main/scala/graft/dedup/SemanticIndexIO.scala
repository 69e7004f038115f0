package graft.dedup

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.similarity.{Pq, Similarity}

/** Durable form of the semantic crawl index — what a deployment writes
  * BETWEEN increments so a restart (or another cluster) reconstructs
  * the exact classifier: the PQ model (codebooks as text — every value
  * via `Double.toString`, which round-trips bit-exactly through
  * `parseDouble`), the coarse quantizer in either shape (flat
  * centroids, or the two-level coarse + fine frames and their id
  * stride), the 8 B/vector code table, and the float vectors the exact
  * re-rank point-reads.
  *
  * Writes are GENERATIONAL with an atomically flipped pointer: every
  * save() lands a complete new tree under `gen=<k>/` and only then
  * replaces the one-line `CURRENT` file (temp write + atomic move), so
  * there is NO point in time where the stored index is a mix of two
  * generations — a crash mid-save leaves `CURRENT` on the old complete
  * generation and the partial new tree is swept by the next save. This
  * also makes the in-place checkpoint cycle `load(dir)` -> append ->
  * `save(dir)` safe: the grown frames' lineage reads the OLD
  * generation's files, which stay untouched until the new one is
  * complete (old generations are deleted after the flip — after a
  * save, the RELOADED handle is the live one, standard checkpoint
  * semantics). Layout:
  *
  * {{{
  *   CURRENT                        "gen=<k>"
  *   gen=<k>/meta.txt               "flat" | "twolevel <stride>"
  *   gen=<k>/model.txt              "m ksub subDim" + codebook rows
  *   gen=<k>/quantizer/centroids/   (flat)      cent_id, cent_vec
  *   gen=<k>/quantizer/coarse/      (twolevel)  cent_id, cent_vec
  *   gen=<k>/quantizer/fine/        (twolevel)  coarse_id, fine_id, cent_vec
  *   gen=<k>/codes/                 c_id, cent_id, c_code, c_xsqn
  *   gen=<k>/vectors/               c_id, c_vec
  * }}}
  *
  * Everything that matters for classification parity is either parquet
  * (binary-exact doubles/floats) or the exact text round-trip, so
  * `load(save(idx))` classifies bit-identically — pinned in
  * ExtensionsSpec for both quantizer shapes, including the full grown
  * in-place cycle. At 100 TB the codes dir is the one large artifact;
  * write it partitioned by bucket (sim_ivfpq_pruned's layout) and pass
  * the read-back frame through [[Dedup.SemanticIndex.copy]] if
  * probe-side partition pruning is wanted — this writer keeps the
  * plain layout.
  */
object SemanticIndexIO {

  private val CurrentFile = "CURRENT"

  /** The generation `CURRENT` points at, or -1 when the dir holds no
    * committed index yet.
    */
  private def currentGen(d: java.nio.file.Path): Long = {
    val cur = d.resolve(CurrentFile)
    if (!java.nio.file.Files.exists(cur)) -1L
    else new String(java.nio.file.Files.readAllBytes(cur), "UTF-8")
      .trim.stripPrefix("gen=").toLong
  }

  def save(index: Dedup.SemanticIndex, dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val oldGen = currentGen(d)
    val gen = oldGen + 1
    val g = d.resolve(s"gen=$gen")
    // a partial gen tree from a crashed save is swept before reuse
    Tables.deleteTree(g)
    java.nio.file.Files.createDirectories(g)
    val model = index.model
    val modelTxt = new StringBuilder()
      .append(s"${model.m} ${model.ksub} ${model.subDim}\n")
    model.codebooks.foreach { row =>
      modelTxt.append(row.map(java.lang.Double.toString).mkString(" "))
        .append('\n')
    }
    java.nio.file.Files.write(g.resolve("model.txt"),
      modelTxt.toString.getBytes("UTF-8"))
    val gs = g.toString
    index.quantizer match {
      case Similarity.FlatQuantizer(centroids) =>
        java.nio.file.Files.write(g.resolve("meta.txt"),
          "flat".getBytes("UTF-8"))
        centroids.write.parquet(s"$gs/quantizer/centroids")
      case Similarity.TwoLevelCoarse(tl) =>
        java.nio.file.Files.write(g.resolve("meta.txt"),
          s"twolevel ${tl.fineK}".getBytes("UTF-8"))
        tl.coarse.write.parquet(s"$gs/quantizer/coarse")
        tl.fine.write.parquet(s"$gs/quantizer/fine")
    }
    // On a FRESHLY BUILT index codes and vectors share the full-history
    // tokenize+embed lineage (semanticIndex releases its build cache
    // before returning) — persist vectors for the duration of the two
    // writes so that pass runs once: the codes plan contains the
    // vectors plan as a fragment, which the cache manager substitutes.
    // Respect a cache the CALLER already owns (persist-then-unpersist
    // here would silently evict it). On a GROWN index the union legs
    // share only the increment's encode fragment (map-only over the
    // small increment — runs twice, minor), not the vectors plan.
    val callerCached =
      index.vectors.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val vec = if (callerCached) index.vectors else index.vectors.persist()
    try {
      vec.write.parquet(s"$gs/vectors")
      index.codes.write.parquet(s"$gs/codes")
    } finally if (!callerCached) vec.unpersist()
    // the COMMIT point: one atomic pointer move — readers see either
    // the old complete generation or the new complete one, never a mix
    val tmp = java.nio.file.Files.createTempFile(d, "_current", ".tmp")
    java.nio.file.Files.write(tmp, s"gen=$gen".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, d.resolve(CurrentFile),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // old generations are dead after the flip; best-effort cleanup
    if (oldGen >= 0) Tables.deleteTree(d.resolve(s"gen=$oldGen"))
  }

  def load(spark: SparkSession, dir: String): Dedup.SemanticIndex = {
    val d = java.nio.file.Paths.get(dir)
    val gen = currentGen(d)
    require(gen >= 0, s"no committed semantic index under $dir " +
      s"(missing $CurrentFile — was save() ever completed here?)")
    val g = d.resolve(s"gen=$gen")
    val gs = g.toString
    val modelLines = new String(java.nio.file.Files
      .readAllBytes(g.resolve("model.txt")), "UTF-8").split("\n")
    val Array(m, ksub, subDim) = modelLines.head.trim.split(" ").map(_.toInt)
    val codebooks = modelLines.tail.filter(_.nonEmpty).map(
      _.trim.split(" ").map(java.lang.Double.parseDouble))
    require(codebooks.length == m * ksub &&
      codebooks.forall(_.length == subDim),
      s"corrupt model.txt under $gs: ${codebooks.length} rows for " +
        s"m=$m ksub=$ksub subDim=$subDim")
    val model = Pq.PqModel(m, ksub, subDim, codebooks)
    val meta = new String(java.nio.file.Files
      .readAllBytes(g.resolve("meta.txt")), "UTF-8").trim.split(" ")
    val quantizer = meta(0) match {
      case "flat" =>
        Similarity.FlatQuantizer(
          spark.read.parquet(s"$gs/quantizer/centroids"))
      case "twolevel" =>
        Similarity.TwoLevelCoarse(Similarity.TwoLevelQuantizer(
          spark.read.parquet(s"$gs/quantizer/coarse"),
          spark.read.parquet(s"$gs/quantizer/fine"),
          meta(1).toInt))
      case other =>
        throw new IllegalArgumentException(
          s"unknown quantizer kind '$other' in $gs/meta.txt")
    }
    Dedup.SemanticIndex(model, quantizer,
      spark.read.parquet(s"$gs/codes"),
      spark.read.parquet(s"$gs/vectors"))
  }
}
