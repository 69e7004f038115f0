package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: the a7 dump's side-counter sub-steps timed in
  * ISOLATION (no concurrent main pass) to localize the ~10s the side
  * future costs inside the dump at sf0.1.
  */
object A7SideProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SIDE $n%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    import graft.gaf.AnnotationPipeline._
    val e2e = graft.queries.GafE2eQueries
    val gaf = e2e.gaf(spark, sfDir)
    val dims = e2e.dims(spark, sfDir)
    val cfg = e2e.cfg
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val src = filterSources(gaf, cfg.sources)
      time("fixpoint")(resolveFixpoint(dims).count())
      val anyResolve = resolveFixpoint(dims)
        .filter(col("cur_status") === "ACTIVE")
        .select(col("raw_rgd_id"), col("cur_id").as("final_rgd_id"))
      val triples = time("triplesFill") {
        val t = src.groupBy(col("db"), col("db_object_id"),
            col("gene_product_form_id"))
          .agg(count(lit(1)).as("_n")).persist()
        t.count(); t
      }
      val notActive = dims.rgdIds
        .filter(col("object_key") === graft.gaf.Constants.GENES_OBJECT_KEY &&
          col("object_status") =!= "ACTIVE")
        .select(col("rgd_id"))
      time("inactiveCascade") {
        matchGenes(triples, dims, cfg.speciesTypeKey,
            Some(graft.operators.Audit.identityResolve(dims)))
          .join(broadcast(notActive), Seq("rgd_id"), "left_semi")
          .agg(coalesce(sum(col("_n")), lit(0L)).cast("long"))
          .head().getLong(0)
      }
      time("anyCascadeOnly") {
        matchGenes(triples, dims, cfg.speciesTypeKey, Some(anyResolve))
          .select(col("db"), col("db_object_id"))
          .dropDuplicates("db", "db_object_id").count()
      }
      time("unmatchedFull") {
        val matchedKeys = matchGenes(triples, dims, cfg.speciesTypeKey,
            Some(anyResolve))
          .select(col("db"), col("db_object_id"))
          .dropDuplicates("db", "db_object_id")
        triples
          .groupBy(col("db"), col("db_object_id"))
          .agg(sum(col("_n")).as("_n"))
          .join(matchedKeys, Seq("db", "db_object_id"), "left_anti")
          .agg(coalesce(sum(col("_n")), lit(0L)).cast("long"))
          .head().getLong(0)
      }
      triples.unpersist()
    }
    spark.stop()
  }
}
