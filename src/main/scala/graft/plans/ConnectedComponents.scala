package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Connected components over an undirected edge list — turns dedup
  * candidate edges (MinHash/SimHash/Jaccard pairs) into duplicate
  * clusters keyed by the minimum member id.
  *
  * Same adaptive split as [[DagClosure]]: union-find on the driver for
  * candidate sets that fit (edges are already the *compressed* star
  * output of LSH, orders of magnitude smaller than the corpus), and
  * distributed alternating min-label propagation above the limit.
  */
object ConnectedComponents {

  /** Above this edge count the distributed propagation is used. 1M boxed
    * edge Rows ≈ low hundreds of MB of driver heap — the safe knee; 5M
    * (the previous value) is multi-GB once Row/boxing overhead is paid.
    */
  val driverSideEdgeLimit = 1000000L

  /** edges (id_a, id_b) -> (id, component) where component = min id of
    * the member's component. Nodes without edges are absent (callers
    * left-join and coalesce to self).
    */
  def components(edges: DataFrame, aCol: String = "id_a",
                 bCol: String = "id_b", maxIters: Int = 32): DataFrame = {
    // persist the deduped edge list for the split's lifetime: the size
    // probe (count) and the consumer (driver collect, or the union +
    // label seed of the distributed path) otherwise each re-execute the
    // FULL upstream edge derivation — for SemDeDup that upstream is the
    // whole blocked pair join, measured as ~half the query's warm cost
    // at sf0.1 (r8). Both paths finish with the edges consumed (the
    // local result is a driver frame; the distributed path starts from
    // a localCheckpoint), so the unpersist is safe.
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
      .persist()
    try {
      if (e.count() <= driverSideEdgeLimit) componentsLocal(e)
      else componentsDistributed(e, maxIters)
    } finally e.unpersist()
  }

  private def componentsLocal(e: DataFrame): DataFrame = {
    val dt = e.schema(0).dataType
    val parent = mutable.Map.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def lt(x: Any, y: Any): Boolean = (x, y) match {
      case (a: Long, b: Long) => a < b
      case (a: Int, b: Int) => a < b
      case (a: String, b: String) => a < b
      case _ => x.toString < y.toString
    }
    def union(x: Any, y: Any): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) {
        // min id wins as the root so components are canonically labeled
        val (lo, hi) = if (lt(rx, ry)) (rx, ry) else (ry, rx)
        parent(hi) = lo
        parent.getOrElseUpdate(lo, lo)
      }
    }
    e.collect().foreach { r => union(r.get(0), r.get(1)) }
    val rows = parent.keysIterator.map(k => Row(k, find(k))).toSeq
    e.sparkSession.createDataFrame(
      java.util.List.of(rows: _*),
      StructType(Seq(StructField("id", dt), StructField("component", dt))))
  }

  /** Alternating min-label propagation: every node repeatedly adopts the
    * minimum label in its neighborhood until fixpoint. Bounded rounds =
    * graph diameter; `localCheckpoint` truncates lineage per round.
    */
  private def componentsDistributed(e: DataFrame, maxIters: Int): DataFrame = {
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var changed = true
    var i = 0
    while (changed && i < maxIters) {
      val viaNeighbor = sym
        .join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(viaNeighbor)
        .groupBy("id").agg(min(col("component")).as("component"))
        .localCheckpoint()
      val diff = next.as("n").join(labels.as("l"), Seq("id"))
        .filter(col("n.component") =!= col("l.component")).limit(1)
      changed = !diff.isEmpty
      labels = next
      i += 1
    }
    // partially-converged labels are silently WRONG (members of one
    // component would carry different labels) — fail loudly. A run whose
    // LAST allowed round applied the final change is still converged, so
    // confirm with one extra propagation before throwing.
    if (changed) {
      val viaNeighbor = sym
        .join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("component"))
      val confirm = labels.select(col("id"), col("component"))
        .union(viaNeighbor)
        .groupBy("id").agg(min(col("component")).as("component"))
      val diff = confirm.as("n").join(labels.as("l"), Seq("id"))
        .filter(col("n.component") =!= col("l.component")).limit(1)
      if (!diff.isEmpty) throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxIters rounds; " +
          "raise maxIters for graphs of this diameter")
    }
    labels
  }
}
