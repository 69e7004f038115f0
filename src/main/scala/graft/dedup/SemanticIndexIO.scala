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
  * re-rank point-reads. Layout under `dir`:
  *
  * {{{
  *   meta.txt              "flat" | "twolevel <stride>"
  *   model.txt             "m ksub subDim" + one line per codebook row
  *   quantizer/centroids/  (flat)      cent_id, cent_vec
  *   quantizer/coarse/     (twolevel)  cent_id, cent_vec
  *   quantizer/fine/       (twolevel)  coarse_id, fine_id, cent_vec
  *   codes/                c_id, cent_id, c_code, c_xsqn
  *   vectors/              c_id, c_vec
  * }}}
  *
  * Everything that matters for classification parity is either parquet
  * (binary-exact doubles/floats) or the exact text round-trip, so
  * `load(save(idx))` classifies bit-identically — pinned in
  * ExtensionsSpec for both quantizer shapes. At 100 TB the codes dir is
  * the one large artifact; write it partitioned by bucket
  * (sim_ivfpq_pruned's layout) and pass the read-back frame through
  * [[Dedup.SemanticIndex.copy]] if probe-side partition pruning is
  * wanted — this writer keeps the plain layout.
  */
object SemanticIndexIO {

  def save(index: Dedup.SemanticIndex, dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    // Every parquet artifact is written to a STAGING subtree first and
    // swapped in only after all writes succeed: the between-increments
    // cycle is load(dir) -> append -> save(dir), where the grown
    // frames' lineage READS the very directories an in-place overwrite
    // would clobber (Spark rejects it with UNSUPPORTED_OVERWRITE.PATH,
    // and a partial overwrite would corrupt the only copy). Standard
    // checkpoint semantics apply AFTER the save: the swap replaces the
    // files under the pre-save object's lineage, so the caller's next
    // increment must use load(dir)'s handle, not the saved object.
    val staging = d.resolve("_staging")
    Tables.deleteTree(staging)
    java.nio.file.Files.createDirectories(staging)
    val model = index.model
    val modelTxt = new StringBuilder()
      .append(s"${model.m} ${model.ksub} ${model.subDim}\n")
    model.codebooks.foreach { row =>
      modelTxt.append(row.map(java.lang.Double.toString).mkString(" "))
        .append('\n')
    }
    java.nio.file.Files.write(staging.resolve("model.txt"),
      modelTxt.toString.getBytes("UTF-8"))
    val sg = staging.toString
    val quantizerDirs: Seq[String] = index.quantizer match {
      case Similarity.FlatQuantizer(centroids) =>
        java.nio.file.Files.write(staging.resolve("meta.txt"),
          "flat".getBytes("UTF-8"))
        centroids.write.parquet(s"$sg/quantizer/centroids")
        Seq("quantizer/centroids")
      case Similarity.TwoLevelCoarse(tl) =>
        java.nio.file.Files.write(staging.resolve("meta.txt"),
          s"twolevel ${tl.fineK}".getBytes("UTF-8"))
        tl.coarse.write.parquet(s"$sg/quantizer/coarse")
        tl.fine.write.parquet(s"$sg/quantizer/fine")
        Seq("quantizer/coarse", "quantizer/fine")
    }
    // codes and vectors share the embedding lineage on a freshly built
    // index (semanticIndex releases its build-time cache before
    // returning) — persist vectors for the duration of the two writes
    // so the tokenize+embed history pass runs ONCE: the codes plan
    // contains the vectors plan as a fragment, which the cache manager
    // substitutes
    val vec = index.vectors.persist()
    try {
      vec.write.parquet(s"$sg/vectors")
      index.codes.write.parquet(s"$sg/codes")
    } finally vec.unpersist()
    // swap: remove old artifacts, move staged ones into place (same
    // filesystem — plain directory moves)
    (quantizerDirs ++ Seq("codes", "vectors", "model.txt", "meta.txt"))
      .foreach { rel =>
        val target = d.resolve(rel)
        Tables.deleteTree(target)
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.move(staging.resolve(rel), target)
      }
    Tables.deleteTree(staging)
  }

  def load(spark: SparkSession, dir: String): Dedup.SemanticIndex = {
    val d = java.nio.file.Paths.get(dir)
    val modelLines = new String(java.nio.file.Files
      .readAllBytes(d.resolve("model.txt")), "UTF-8").split("\n")
    val Array(m, ksub, subDim) = modelLines.head.trim.split(" ").map(_.toInt)
    val codebooks = modelLines.tail.filter(_.nonEmpty).map(
      _.trim.split(" ").map(java.lang.Double.parseDouble))
    require(codebooks.length == m * ksub &&
      codebooks.forall(_.length == subDim),
      s"corrupt model.txt under $dir: ${codebooks.length} rows for " +
        s"m=$m ksub=$ksub subDim=$subDim")
    val model = Pq.PqModel(m, ksub, subDim, codebooks)
    val meta = new String(java.nio.file.Files
      .readAllBytes(d.resolve("meta.txt")), "UTF-8").trim.split(" ")
    val quantizer = meta(0) match {
      case "flat" =>
        Similarity.FlatQuantizer(
          spark.read.parquet(s"$dir/quantizer/centroids"))
      case "twolevel" =>
        Similarity.TwoLevelCoarse(Similarity.TwoLevelQuantizer(
          spark.read.parquet(s"$dir/quantizer/coarse"),
          spark.read.parquet(s"$dir/quantizer/fine"),
          meta(1).toInt))
      case other =>
        throw new IllegalArgumentException(
          s"unknown quantizer kind '$other' in $dir/meta.txt")
    }
    Dedup.SemanticIndex(model, quantizer,
      spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/vectors"))
  }
}
