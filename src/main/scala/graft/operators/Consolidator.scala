package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TokenOps

/** A4 — WITH_INFO consolidation (WithInfoConsolidator.java:9-143).
  *
  * Rows sharing the consolidation key merge their `[|,]`-delimited token
  * lists into one sorted set, which is re-fragmented into `|`-joined
  * strings of <= cap chars; `explode` then emits exactly fragment-count
  * rows — the reference's clone-extra-rows / delete-surplus-rows
  * bookkeeping (WithInfoConsolidator.java:96-139) disappears.
  *
  * Rows with an empty/null token column never merge (the reference tags
  * them `" EMPTY"` — WithInfoConsolidator.java:23-36); they pass through
  * a union, not a special group.
  *
  * Plan shape: one hash-aggregate shuffle on the key; the token-set
  * union runs as built-in `collect_list`/`flatten`/`array_distinct`/
  * `array_sort` expressions with map-side partial aggregation; only the
  * final fragmenting is a Scala UDF (small input: one sorted token array
  * per group).
  */
object Consolidator {

  val fragmentUdf =
    udf((tokens: Seq[String], cap: Int) => TokenOps.fragment(tokens, cap))

  /** Sorted-distinct union of split tokens. The per-row split runs as
    * the native [[graft.functions.TokenSplitExpr]] (the former
    * filter/transform/split chain evaluated its lambdas interpreted on
    * every input row); the set union stays in builtin aggregates with
    * map-side partials.
    */
  def tokenSetAgg(tokenCol: Column): Column =
    array_sort(array_distinct(flatten(collect_list(
      graft.functions.TokenSplitExpr.splitTokens(tokenCol)))))

  /** @param keyCols  consolidation key (A4: term_acc, rgd_id, ref_rgd_id,
    *                 evidence, qualifier, xref_source, data_src, notes)
    * @param tokenCol the `[|,]`-delimited column to consolidate
    * @param cap      serialized-length cap (1700 for WITH_INFO)
    * @param stage    stage the input through one explicit hash exchange
    *                 (default). Pass false ONLY when `df` is a filled
    *                 persisted cache: there the branch re-reads are cheap
    *                 cache scans, the staging exchange would shuffle every
    *                 row FULL-WIDTH before any reduction, and skipping it
    *                 lets the mergeable branch's partial aggregation
    *                 collapse rows map-side before its own exchange (the
    *                 counter dump's measured shape).
    *
    * Single-pass (stage = true): the input is staged through ONE explicit
    * hash exchange on the key, which both the mergeable branch (whose
    * groupBy then needs no further shuffle — the partitioning already
    * satisfies the clustered distribution) and the empties branch
    * consume. Without the staging exchange each branch re-executes the
    * whole upstream plan (for the e2e pipeline that upstream is the full
    * broadcast-join cascade from the scan — a 2x scan at any scale). The
    * cap split is a single conditional projection, not a second pair of
    * branches, so the aggregate output is consumed exactly once.
    */
  def consolidate(df: DataFrame, keyCols: Seq[String], tokenCol: String,
                  cap: Int, stage: Boolean = true): DataFrame = {
    val passCols = df.columns.filterNot(c => keyCols.contains(c) || c == tokenCol)
    val staged = if (stage) df.repartition(keyCols.map(col): _*) else df
    val mergeable = staged.filter(length(coalesce(col(tokenCol), lit(""))) > 0)
    val empties = staged.filter(length(coalesce(col(tokenCol), lit(""))) === 0)

    val aggs = array_join(tokenSetAgg(col(tokenCol)), "|").as("_tok") +:
      passCols.map(c => max(col(c)).as(c))
    val merged = mergeable
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    // common case (merged set fits the cap): the joined sorted set IS the
    // single fragment — explode of a 1-element array, entirely inside
    // codegen'd builtins. The fragmenting UDF runs only on the rare
    // oversized groups (CaseWhen evaluates branches conditionally).
    val out = merged.withColumn(tokenCol,
        explode(when(length(col("_tok")) <= cap, array(col("_tok")))
          .otherwise(fragmentUdf(split(col("_tok"), "\\|"), lit(cap)))))
      .drop("_tok")

    out.select(df.columns.map(col): _*)
      .unionByName(empties.select(df.columns.map(col): _*))
  }
}
