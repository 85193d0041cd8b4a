package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ranking over an edge relation — the Pregel-shaped
  * family beyond [[Dedup.components]]' label propagation: PageRank as
  * repeated (join → per-edge message → partial-aggregated combine).
  *
  * All arithmetic is SCALED-INTEGER (ranks ×10⁶, per-edge integer
  * division BEFORE the sum): integer sums are order-independent, so the
  * result is bit-identical across engines, partitionings, and cluster
  * sizes — a float PageRank can't be cross-engine-verified because the
  * neighbor-sum order is nondeterministic. The cost is the standard
  * truncation bias of fixed-point math (≤ deg ulps per node per round),
  * identical on both engines by construction.
  */
object Graph {

  /** `iters` rounds of damped PageRank (d = 0.85, teleport 0.15, rank
    * scale ×10⁶) over a DIRECTED edge list; returns (id, rank) for every
    * node appearing as a source or destination. Per round:
    * rank'(v) = 150000 + 850·Σ_{u→v} (rank(u) div deg(u)) div 1000.
    * Dangling mass is dropped (the simplified variant) — feed an
    * undirected (symmetrized) edge list to avoid dangling nodes.
    *
    * Scale shape: the edge list and degree frame stage once
    * ([[Stage.barrier]] — every round's join reads them from memory);
    * each round is ONE shuffle: the 8-byte-key edge⋈rank join, a narrow
    * per-edge projection, and a map-side-combined sum keyed on dst. The
    * rank frame is |nodes| rows (ids + one long). Plan depth grows
    * linearly in `iters` with no self-reference, so a handful of rounds
    * needs no checkpoint truncation (components() iterates to an
    * unbounded fixpoint and does need it — different regime). */
  def pageRank(edges: DataFrame, iters: Int = 3, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = Stage.barrier(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct())
    val nodes = Stage.barrier(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val deg = Stage.barrier(
      e.groupBy(col("src")).agg(count(lit(1)).cast("long").as("deg")))
    var r = nodes.withColumn("rank", lit(1000000L))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(r.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).cast("long").as("s"))
      r = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          expr("150000 + (850 * coalesce(s, 0)) div 1000").as("rank"))
    }
    r
  }
}
