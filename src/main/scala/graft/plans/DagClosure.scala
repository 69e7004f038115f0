package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transitive closure over a DAG edge table — the one operator the
  * reference delegates to Oracle `CONNECT BY` (OntologyXDAO, SURVEY.md
  * §2.3 J10, DAO.java:255-258).
  *
  * Semi-naive iteration: each round joins only the *frontier* (pairs
  * discovered last round) against the edge table, anti-joins out known
  * pairs, and stops at fixpoint. `localCheckpoint` truncates lineage so
  * plans stay O(1) per round instead of O(depth).
  *
  * Scale: edge dims (ontology DAGs) are small (~100k edges) — the edge
  * side is broadcast, so each round is a map-side join; the accumulated
  * closure never shuffles more than its own dedup. For a truly huge graph
  * this flips to shuffle joins automatically via AQE.
  */
object DagClosure {

  /** (parent, child) edges -> (ancestor, descendant) closure (irreflexive). */
  def closure(edges: DataFrame, parentCol: String, childCol: String,
              maxIters: Int = 64): DataFrame = {
    val e = edges.select(col(parentCol).as("ancestor"),
                         col(childCol).as("descendant")).distinct()
    var acc = e.localCheckpoint()
    var frontier = acc
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      val next = frontier.as("f")
        .join(broadcast(e.as("e")), col("f.descendant") === col("e.ancestor"))
        .select(col("f.ancestor").as("ancestor"),
                col("e.descendant").as("descendant"))
        .distinct()
        .join(acc, Seq("ancestor", "descendant"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        acc = acc.union(next).localCheckpoint()
        frontier = next
      }
      i += 1
    }
    acc
  }

  /** Descendant set of one node — BFS from the root only (cheaper than the
    * full closure). Powers F5's "is term a descendant of GO:0003824"
    * predicate as a broadcast semi-join instead of a per-row hierarchical
    * query (OntologyXDAO.isDescendantOf).
    */
  def descendantsOf(edges: DataFrame, parentCol: String, childCol: String,
                    root: Column, maxIters: Int = 64): DataFrame = {
    val e = edges.select(col(parentCol).as("p"), col(childCol).as("c")).distinct()
    var acc = e.filter(col("p") === root).select(col("c").as("descendant"))
      .distinct().localCheckpoint()
    var frontier = acc
    var i = 0
    var done = frontier.isEmpty
    while (!done && i < maxIters) {
      val next = frontier
        .join(broadcast(e), col("descendant") === col("p"))
        .select(col("c").as("descendant")).distinct()
        .join(acc, Seq("descendant"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) done = true
      else { acc = acc.union(next).localCheckpoint(); frontier = next }
      i += 1
    }
    acc
  }
}
