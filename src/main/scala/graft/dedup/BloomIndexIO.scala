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
    // every payload stream is hsync-ed before close (SemanticIndexIO's
    // sync-before-move discipline): without it a power loss could leave
    // the _SUCCESS marker durable while filter bytes are still
    // truncated in the page cache — load would then die inside
    // BloomFilter.readFrom instead of reading as "no index here" the
    // way the marker contract promises
    def sync(out: org.apache.hadoop.fs.FSDataOutputStream): Unit =
      try out.hsync()
      catch { case _: UnsupportedOperationException => out.hflush() }
    val meta = fs.create(new Path(d, "meta.txt"))
    try {
      meta.write(
        (s"$Format\n${index.k}\n${index.bands}\n${index.expectedItems}\n" +
          s"${index.inserted}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      sync(meta)
    } finally meta.close()
    def writeFilter(name: String, f: BloomFilter): Unit = {
      val out = fs.create(new Path(d, name))
      try { f.writeTo(out); sync(out) } finally out.close()
    }
    writeFilter("fp.bloom", index.fp)
    writeFilter("band.bloom", index.band)
    val marker = fs.create(new Path(d, "_SUCCESS"))
    try sync(marker) finally marker.close()
  }

  /** Bounded operational snapshot of a stored bloom index — the third
    * store's parity with `DedupIndexIO.stats()` /
    * `SemanticIndexIO.stats()` (r16): filter geometry (the shingle k
    * and band count plus each filter's bit size), the saturation
    * position (`inserted` docs folded against the `expectedItems`
    * budget the filters were sized for, and their ratio — the
    * [[BloomIndex.fold]] guard refuses past 1.0), and the fp filter's
    * ESTIMATED fill from its live geometry
    * (`expectedFpp()`, rises toward 1 as the filter saturates). Reads
    * meta + the filter headers only — a handful of scalars, no corpus
    * scan (there is no corpus here; the filters ARE the store).
    */
  final case class StoreStats(k: Int, bands: Int, expectedItems: Long,
                              inserted: Long, saturation: Double,
                              fpBits: Long, bandBits: Long,
                              fpExpectedFpp: Double,
                              bandExpectedFpp: Double)

  def stats(spark: SparkSession, dir: String): StoreStats = {
    val idx = load(spark, dir)
    StoreStats(idx.k, idx.bands, idx.expectedItems, idx.inserted,
      saturation =
        if (idx.expectedItems == 0L) 0.0
        else idx.inserted.toDouble / idx.expectedItems,
      fpBits = idx.fp.bitSize(), bandBits = idx.band.bitSize(),
      fpExpectedFpp = idx.fp.expectedFpp(),
      bandExpectedFpp = idx.band.expectedFpp())
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
