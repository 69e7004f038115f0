package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column extension queries: documents.text synthesized into a
  * binary media table (deterministic), then driven through the real
  * plumbing. mm_decode_features' text payloads are not decodable images,
  * so their checksum/feature exercise the documented stub boundary (JVM
  * fold) — no SQL oracle; real pixel decode + the stub boundary are both
  * spec-tested in ExtensionsSpec.
  */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "mm_meta_extract" -> ((s, d) => {
      import s.implicits._
      Multimodal.fromText(Tables.documents(s, d), "doc_id", "text")
        .select($"media_id", $"media_type",
          octet_length($"payload").as("n_bytes"), $"width", $"height")
    }),

    "mm_decode_features" -> ((s, d) => {
      import s.implicits._
      // decoded_width/height surface the imageio header decode: null
      // here (utf-8 payloads are not images — the sniff skips them);
      // real-PNG decoding is exercised in ExtensionsSpec
      Multimodal.decodeFeatures(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text"))
        .toDF()
        .select($"media_id", $"n_bytes", $"checksum",
          $"decoded_width", $"decoded_height",
          round(element_at($"feature", 1), 4).as("f0"))
    }),

    "mm_frame_sampling" -> ((s, d) => {
      import s.implicits._
      Multimodal.sampleOffsets(
        Multimodal.fromText(Tables.documents(s, d), "doc_id", "text"),
        stepMs = 500)
        .select($"media_id", $"offset_ms")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "mm_meta_extract" ->
      """SELECT doc_id AS media_id, 'image' AS media_type,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(length(text) % 640 AS INT) AS width,
        |  CAST(length(text) % 480 AS INT) AS height
        |FROM documents""".stripMargin,

    "mm_frame_sampling" ->
      """SELECT doc_id AS media_id, CAST(off AS INT) AS offset_ms
        |FROM (SELECT doc_id, length(text) * 10 AS duration_ms FROM documents)
        |CROSS JOIN generate_series(0, 1000000, 500) t(off)
        |WHERE duration_ms > 0 AND off <= duration_ms - 1""".stripMargin
  )
}
