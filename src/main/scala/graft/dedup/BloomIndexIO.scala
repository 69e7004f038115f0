package graft.dedup

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/** Durable store for the Bloom dedup index ([[BloomIndex.Index]]) —
  * makes the persistence story the Index scaladoc promises
  * ("`BloomFilter.writeTo/readFrom` is the between-increments
  * persistence format") actual code, completing durable deployment for
  * all three crawl-loop legs ([[DedupIndexIO]] for the exact keys,
  * [[SemanticIndexIO]] for the IVFADC artifact).
  *
  * Layout: `meta.txt` (format version + the Index's geometry and
  * saturation counters — k, bands, expectedItems, inserted), `fp.bloom`
  * and `band.bloom` (the two filters via `BloomFilter.writeTo`), and a
  * `_SUCCESS` marker created LAST. [[load]] requires the marker, so a
  * crash mid-save leaves debris that reads as "no index here" rather
  * than filters silently missing their fold history (an `inserted`
  * undercount would let the next [[BloomIndex.fold]] sail past the
  * saturation budget it exists to enforce).
  *
  * Unlike the exact-keys store there is no append: Bloom bits fold
  * in MEMORY ([[BloomIndex.fold]] returns a new Index) and each
  * deployment cycle persists the folded result as a NEW generation
  * directory — [[save]] refuses an existing path, so a half-replaced
  * store can never alias a committed one. The filters are a few MB at
  * any budget (driver-sized by construction — they broadcast to every
  * executor for map-only classify), so a full-index write per cycle is
  * the cheap, simple shape; the append-only machinery the other two
  * stores need exists because THEIR artifacts grow with history.
  */
object BloomIndexIO {

  private val Format = 1

  def save(index: BloomIndex.Index, spark: SparkSession,
           dir: String): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(d),
      s"BloomIndexIO.save: $dir already exists — a store is one " +
        "committed generation; write a new path and switch readers")
    fs.mkdirs(d)
    val meta = fs.create(new Path(d, "meta.txt"))
    try meta.write(
      (s"$Format\n${index.k}\n${index.bands}\n${index.expectedItems}\n" +
        s"${index.inserted}\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally meta.close()
    def writeFilter(name: String, f: BloomFilter): Unit = {
      val out = fs.create(new Path(d, name))
      try f.writeTo(out) finally out.close()
    }
    writeFilter("fp.bloom", index.fp)
    writeFilter("band.bloom", index.band)
    fs.create(new Path(d, "_SUCCESS")).close()
  }

  def load(spark: SparkSession, dir: String): BloomIndex.Index = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(d, "_SUCCESS")),
      s"BloomIndexIO.load: $dir has no _SUCCESS marker — either not a " +
        "bloom index store or a save crashed mid-write; treat as absent")
    val metaIn = fs.open(new Path(d, "meta.txt"))
    val lines =
      try scala.io.Source.fromInputStream(metaIn, "UTF-8")
        .getLines().toIndexedSeq
      finally metaIn.close()
    require(lines.length >= 5 && lines.head.trim == Format.toString,
      s"BloomIndexIO.load: unsupported store format " +
        s"'${lines.headOption.getOrElse("")}' at $dir (this build reads " +
        s"format $Format)")
    def readFilter(name: String): BloomFilter = {
      val in = fs.open(new Path(d, name))
      try BloomFilter.readFrom(in) finally in.close()
    }
    BloomIndex.Index(
      fp = readFilter("fp.bloom"), band = readFilter("band.bloom"),
      k = lines(1).trim.toInt, bands = lines(2).trim.toInt,
      expectedItems = lines(3).trim.toLong,
      inserted = lines(4).trim.toLong)
  }
}
