package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gaf.Dims
import graft.operators.MergeSink

/** Scratch main: skew probe for the classify-merge (round-5 verdict #8).
  *
  * The MERGE sink's one shuffle is a full-outer join on the 7-field
  * unique key. AQE's skew-join optimizer does NOT split full-outer
  * joins, so the scale question is whether a hot key can concentrate a
  * partition at all. Structurally it cannot IF both sides are unique on
  * the key — which the pipeline guarantees (existing is the previous
  * merge output, unique by construction; incoming is AnnotMerge's
  * groupBy(mergeKey) output) — because hashing the FULL composite key
  * spreads rows that share any hot prefix. This probe measures three
  * shapes at ~10x the sf0.1 e2e volume (1M existing x 1M incoming):
  *
  *   uniform    — keys spread evenly (baseline)
  *   hot_prefix — 30% of incoming shares ONE (term_acc, object, ref,
  *                evidence, qualifier) prefix, unique via with_info:
  *                the realistic "hot GO term" shape
  *   hot_dup    — 30% of incoming shares ONE full 7-field key: a
  *                CONTRACT VIOLATION (m x 1 join fan-out) measured to
  *                characterize the failure mode the uniqueness contract
  *                exists to prevent
  *
  * Usage: Test/runMain graft.MergeSkewMain [rows]
  */
object MergeSkewMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def spin(): Double = {
      val t0 = System.nanoTime(); var x = 0L; var i = 0
      while (i < 300000000) { x += i; i += 1 }
      if (x == 42L) println("?") // keep the loop un-eliminable
      (System.nanoTime() - t0) / 1e9
    }
    println(f"MERGE_SKEW calib_1t=${spin()}%.2fs")

    // annotation-shaped frame over [lo, lo+n): unique key fields derive
    // from id; `hotDen` > 0 routes 3-in-hotDen rows to one hot prefix
    // (`dup` additionally collapses their with_info AND xref_source, so
    // the hot rows become FULL-key duplicates of each other)
    def annot(lo: Long, rows: Long, hotDen: Int, dup: Boolean): DataFrame = {
      val base = spark.range(lo, lo + rows).toDF("id")
      val isHot = if (hotDen > 0) pmod(col("id"), lit(hotDen)) < 3 else lit(false)
      val keyed = base.select(
        when(isHot, lit("GO:9999999"))
          .otherwise(concat(lit("GO:"), pmod(col("id"), lit(50000))))
          .as("term_acc"),
        when(isHot, lit(777)).otherwise(pmod(col("id"), lit(100000)))
          .cast("int").as("annotated_object_rgd_id"),
        when(isHot, lit(1)).otherwise(pmod(col("id"), lit(1000)))
          .cast("int").as("ref_rgd_id"),
        when(isHot, lit("IEA"))
          .otherwise(when(pmod(col("id"), lit(3)) === 0, "ISO").otherwise("IEA"))
          .as("evidence"),
        (if (dup) when(isHot, lit("W:HOT"))
            .otherwise(concat(lit("W:"), col("id")))
          else concat(lit("W:"), col("id"))).as("with_info"),
        lit(null).cast("string").as("qualifier"),
        (if (dup) when(isHot, lit("SRC:HOT"))
            .otherwise(concat(lit("SRC:"), pmod(col("id"), lit(7))))
          else concat(lit("SRC:"), pmod(col("id"), lit(7)))).as("xref_source"),
        col("id"))
      Dims.fullAnnot.fields.foldLeft(keyed) { (df, f) =>
        if (df.columns.contains(f.name)) df
        else df.withColumn(f.name, f.name match {
          case "notes" => concat(lit("note "), col("id"))
          case "object_symbol" => concat(lit("Sym"), pmod(col("id"), lit(9999)))
          case _ => lit(null).cast(f.dataType)
        })
      }.select(Dims.fullAnnot.fieldNames.map(col).toSeq: _*).drop("id")
    }

    val ts = Timestamp.valueOf("2026-01-01 00:00:00")
    def run(name: String, exHotDen: Int, inHotDen: Int, dup: Boolean): Unit = {
      // existing = previous run over [0, n): unique keys, real surrogate
      // keys; incoming = [n/2, 3n/2): half touch/update, half insert
      val existing = annot(0L, n, exHotDen, dup)
        .withColumn("full_annot_key", monotonically_increasing_id() + 1)
        .withColumn("created_date", lit(ts))
        .withColumn("last_modified_date", lit(ts))
        .withColumn("created_by", lit(190))
        .withColumn("last_modified_by", lit(190))
        .select(Dims.fullAnnot.fieldNames.map(col).toSeq: _*)
      val incoming = annot(n / 2, n, inHotDen, dup)
      val t0 = System.nanoTime()
      val merged = MergeSink.merge(existing, incoming, ts, 190)
      val digest = merged
        .select(xxhash64(struct(merged.columns.map(col).toSeq: _*)).as("_h"))
        .agg(expr("bit_xor(_h)")).head().getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"MERGE_SKEW shape=$name n=$n wall=$wall%.1fs digest=$digest%016x")
    }

    // warmup (codegen/JIT) so the first timed shape isn't billed for it
    run("warmup", 0, 0, dup = false)
    // 30% of incoming on one key PREFIX (unique composite keys) — the
    // realistic hot-GO-term shape; full-key hashing must spread it
    run("uniform", 0, 0, dup = false)
    run("hot_prefix", 0, 10, dup = false)
    // 0.3% of BOTH sides collapsed to one full key (~3k x 3k = 9M-row
    // fan-out in a single unsplittable full-outer partition): the
    // contract violation the upstream uniqueness guarantee prevents
    run("hot_dup", 1000, 1000, dup = true)
    println(f"MERGE_SKEW calib_1t_post=${spin()}%.2fs")
    spark.stop()
  }
}
