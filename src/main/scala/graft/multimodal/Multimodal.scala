package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract as
  * partition-local batch transforms.
  *
  * Image decode is REAL for every format the JDK's `javax.imageio`
  * registry can read (PNG/BMP/GIF/JPEG here): [[pixelFeatures]] computes
  * the 8-dim feature vector from actual decoded pixels, and
  * [[imageDims]] reads header dimensions. Audio decode is REAL for PCM
  * WAV via [[WavCodec]] (`javax.sound.sampled`, in [[defaultCodecs]]).
  * The stub boundary is narrowed to what is genuinely absent in this
  * environment — payloads NO registered codec decodes (video, compressed
  * audio, exotic image formats): [[stubDecode]] derives a deterministic
  * fake feature vector from the raw bytes for those. Everything else — schema, batch shape,
  * partition-local iteration, column pruning — is the real production
  * plumbing: register another codec (or swap stubDecode for a JNI call)
  * and nothing else changes. (The reference pipeline has no media path;
  * this implements the north-star extension from BASELINE.json.)
  *
  * Scale notes: media bytes dominate row size, so the transform is
  * `mapPartitions` over an iterator (never materializes a partition),
  * feature output drops the payload column immediately (schema
  * narrowing), and batch boundaries amortize per-batch codec setup the
  * way Arrow batches do for vectorized UDFs.
  */
object Multimodal {

  /** A pluggable payload decoder — the deployment extension point that
    * turns the audio/video stub boundary into configuration (the
    * Transport-adapter pattern): a codec CLAIMS payloads by a cheap
    * sniff (magic bytes / media_type) and produces dimensions + the
    * feature vector. [[decodeFeatures]] tries injected codecs in order
    * before its built-in imageio path; unclaimed payloads keep the
    * documented stub fallback. Codecs ship to executors inside the
    * mapPartitions closure, hence Serializable; per-batch setup (a
    * native decoder context, a JNI handle) belongs in [[MediaCodec.open]],
    * called once per batch.
    */
  trait MediaCodec extends Serializable {
    def name: String
    /** cheap claim check — magic sniff and/or media_type. */
    def claims(mediaType: String, payload: Array[Byte]): Boolean
    def decode(mediaType: String, payload: Array[Byte]): Decoded
    /** per-batch initialization hook (codec context setup); default no-op. */
    def open(): Unit = ()
  }

  final case class Decoded(width: Option[Int], height: Option[Int],
                           feature: Array[Float])

  /** The public codec registry [[decodeFeatures]] runs by default:
    * real decoders built entirely on the JDK. [[WavCodec]] decodes PCM
    * WAV audio through `javax.sound.sampled`; images are handled by the
    * built-in imageio path below the codec chain. Adding a codec here is
    * output-compatible by contract: every codec fails SOFT to the
    * documented stub on payloads it claims but cannot decode, so rows
    * that were stubbed before a codec existed stay byte-identical
    * (the `mm_decode_features` digest pin holds across registry growth).
    */
  val defaultCodecs: Seq[MediaCodec] = Seq(WavCodec)

  /** media row: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),   // image | audio | video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  final case class MediaFeature(
      media_id: Long, media_type: String, n_bytes: Int,
      checksum: Long, decoded_width: Option[Int],
      decoded_height: Option[Int], feature: Array[Float])

  /** REAL image-header decode via `javax.imageio` (ships in the JDK —
    * no external codec needed): width/height for payloads whose magic
    * bytes say PNG/JPEG/GIF/BMP, header-only (`reader.getWidth(0)`
    * reads dimensions without decoding pixel data — O(header) per row,
    * not O(pixels)). Non-image payloads skip the reader entirely via
    * the magic sniff and yield None. This shrinks the stubbed surface
    * to what is genuinely absent in this environment: pixel/audio/video
    * FEATURE extraction ([[stubDecode]]).
    */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def magic(sig: Int*): Boolean =
      bytes.length >= sig.length &&
        sig.zipWithIndex.forall { case (b, i) => (bytes(i) & 0xff) == b }
    val looksImage = magic(0x89, 'P', 'N', 'G') ||
      magic(0xff, 0xd8, 0xff) || magic('G', 'I', 'F', '8') ||
      magic('B', 'M')
    if (!looksImage) None
    else {
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory defaults to a FileCacheImageInputStream backed by a
      // temp file — per-row disk I/O in the hot decode loop (and a null
      // return when no SPI is registered). The payload is already fully
      // in memory, so the memory-cache stream is strictly better here.
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } catch { case _: Exception => None } // truncated/corrupt header
      finally in.close()
    }
  }

  /** Deterministic stand-in for payloads NO registered codec decodes
    * (audio/video/exotic formats — genuinely absent in this
    * environment): folds the payload into an 8-dim pseudo-feature.
    * Decodable images never reach this — they get [[pixelFeatures]]
    * from real pixels. Replace with a real codec at deployment —
    * `???`-equivalent, but runnable so the plumbing is testable.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Full pixel decode via the JDK imageio registry: `ImageIO.read` over
    * the in-memory payload, None when the magic sniff says non-image or
    * no codec/corrupt data. PNG/BMP/GIF/JPEG decode out of the box.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    def magic(sig: Int*): Boolean =
      bytes.length >= sig.length &&
        sig.zipWithIndex.forall { case (b, i) => (bytes(i) & 0xff) == b }
    val looksImage = magic(0x89, 'P', 'N', 'G') ||
      magic(0xff, 0xd8, 0xff) || magic('G', 'I', 'F', '8') ||
      magic('B', 'M')
    if (!looksImage) None
    else {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try Option(javax.imageio.ImageIO.read(in))
      catch { case _: Exception => None } // truncated/corrupt payload
      // ImageIO.read closes its ImageInputStream on success; the
      // second close must not throw on that path
      finally try in.close() catch { case _: java.io.IOException => () }
    }
  }

  /** REAL 8-dim image feature vector from decoded pixels (channel means,
    * luma mean/stddev, mean horizontal gradient, aspect, log-scale):
    *
    *   f0/f1/f2  mean R/G/B in [0,1]
    *   f3        mean luma (Rec.601: .299R + .587G + .114B) in [0,1]
    *   f4        luma standard deviation in [0,1]
    *   f5        mean |horizontal luma gradient| in [0,1] (0 for w=1)
    *   f6        aspect w/(w+h)
    *   f7        log10(1 + pixel count) / 9 (unit scale up to 1e9 px)
    *
    * Exact on solid colors by construction: f0..f2 = channel/255,
    * f4 = f5 = 0 — pinned by spec. Pixels read via `getRGB` (sRGB
    * conversion applied by the JDK), so indexed/gray images normalize
    * to the same color space.
    */
  def pixelFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val n = w.toLong * h
    var sr, sg, sb, sy, syy, sgrad = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      var prevLuma = 0.0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b
        sy += luma; syy += luma * luma
        if (x > 0) sgrad += math.abs(luma - prevLuma)
        prevLuma = luma
        x += 1
      }
      y += 1
    }
    val inv = if (n > 0) 1.0 / n else 0.0
    val meanLuma = sy * inv
    val varLuma = math.max(0.0, syy * inv - meanLuma * meanLuma)
    val nGrad = (w - 1).toLong * h
    Array(
      (sr * inv / 255.0).toFloat,
      (sg * inv / 255.0).toFloat,
      (sb * inv / 255.0).toFloat,
      (meanLuma / 255.0).toFloat,
      (math.sqrt(varLuma) / 255.0).toFloat,
      (if (nGrad > 0) sgrad / nGrad / 255.0 else 0.0).toFloat,
      (if (w + h > 0) w.toDouble / (w + h) else 0.0).toFloat,
      (math.log10(1.0 + n.toDouble) / 9.0).toFloat)
  }

  private def checksum64(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** Partition-local batched decode: media rows in, narrow feature rows
    * out. The iterator is processed in `batchSize` groups so a real codec
    * can amortize per-batch initialization (Arrow-batch analog).
    *
    * Decodable images get REAL pixel features ([[pixelFeatures]]) and
    * their decoded dimensions; everything else falls back to the header
    * sniff for dims and [[stubDecode]] for the feature — the documented
    * codec boundary.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64,
                     codecs: Seq[MediaCodec] = defaultCodecs): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.select("media_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          codecs.foreach(_.open()) // per-batch codec setup
          batch.iterator.map { case (id, tpe, payload) =>
            val bytes = if (payload == null) Array.emptyByteArray else payload
            codecs.find(_.claims(tpe, bytes)) match {
              case Some(c) =>
                val d = c.decode(tpe, bytes)
                MediaFeature(id, tpe, bytes.length, checksum64(bytes),
                  d.width, d.height, d.feature)
              case None => decodeImage(bytes) match {
                case Some(img) =>
                  MediaFeature(id, tpe, bytes.length, checksum64(bytes),
                    Some(img.getWidth), Some(img.getHeight),
                    pixelFeatures(img))
                case None =>
                  val dims = imageDims(bytes)
                  MediaFeature(id, tpe, bytes.length, checksum64(bytes),
                    dims.map(_._1), dims.map(_._2), stubDecode(bytes))
              }
            }
          }
        }
      }
  }

  /** Frame/segment sampling metadata: every `stepMs` offset up to the
    * duration — the explode-side of video frame extraction, computed
    * without touching payload bytes (column pruning keeps the scan
    * narrow).
    */
  def sampleOffsets(media: DataFrame, stepMs: Int): DataFrame =
    media.select(col("media_id"), col("duration_ms"))
      .filter(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .withColumn("offset_ms",
        explode(sequence(lit(0), col("duration_ms") - 1, lit(stepMs))))

  /** Synthesize a media table from any text column (dev/test source:
    * deterministic bytes = utf-8 payload).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      (length(col(textCol)) % 640).cast("int").as("width"),
      (length(col(textCol)) % 480).cast("int").as("height"),
      (length(col(textCol)) * 10).cast("int").as("duration_ms"))
}
