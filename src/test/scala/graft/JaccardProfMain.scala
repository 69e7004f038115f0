package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scratch main: stage-time the jaccardPairs plan at a given sf dir to
  * find the real hotspot (cumulative — each timing includes its inputs).
  */
object JaccardProfMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = Tables.documents(spark, d)
    val (n, tn, td) = (5, 8, 10)

    def t(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"JPROF $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$r")
    }

    val sh = df.select(col("doc_id").as("id"),
      explode(Dedup.shingles(col("text"), n)).as("s"))
    t("sh")(sh.count())

    val freq = sh.groupBy("s").agg(count(lit(1)).as("s_freq"))
    t("freq")(freq.count())

    val docs = sh.join(freq, "s")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("s_freq"), col("s")))).as("fs"))
      .select(col("id"),
        transform(col("fs"), x => x.getField("s")).as("sarr"),
        size(col("fs")).as("n_sh"))
      .withColumn("prefix_len", col("n_sh") -
        expr(s"(n_sh * $tn + $td - 1) div $td") + 1)
    t("docs")(docs.count())

    val pref = docs.select(col("id"), col("n_sh"),
      explode(slice(col("sarr"), lit(1), col("prefix_len"))).as("s"))
    t("pref")(pref.count())

    val cands = pref.as("a").join(pref.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          least(col("a.n_sh"), col("b.n_sh")) * td >=
            greatest(col("a.n_sh"), col("b.n_sh")) * tn)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    t("cands")(cands.count())

    t("full")(Dedup.jaccardPairs(df, "doc_id", "text", n, tn, td).count())
    spark.stop()
  }
}
