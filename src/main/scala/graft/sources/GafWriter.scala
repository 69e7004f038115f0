package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gaf.GafSchema

/** GAF sink: renders 17-column GAF DataFrames back to gzip TSV with the
  * standard header — the inverse of [[GafReader]] and the file-level
  * counterpart of the S6 re-projection. Null-safe: absent optional
  * columns serialize as empty fields, matching `split("\t", -1)` on
  * re-read (round-trip tested).
  */
object GafWriter {

  def write(gaf: DataFrame, outDir: String,
            header: String = "!gaf-version: 2.2"): Unit = {
    val line = concat_ws("\t",
      GafSchema.columns.map(c => coalesce(col(c), lit(""))): _*)
    gaf.select(line.as("value"))
      .write.mode("overwrite")
      .option("compression", "gzip")
      .text(outDir)
    // the `!` header is metadata, not data — rendered once, driver-side
    val fs = org.apache.hadoop.fs.FileSystem.get(
      gaf.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(outDir, "_header.gaf"), true)
    out.write((header + "\n").getBytes("UTF-8"))
    out.close()
  }
}
