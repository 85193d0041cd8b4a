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
    * rank'(v) = 150000 + 850·(Σ_{u→v} (rank(u) div deg(u)) [+ share]) div
    * 1000. By default dangling mass is dropped (the simplified variant —
    * feed a symmetrized edge list to avoid dangling nodes);
    * `redistributeDangling` adds the standard correction: each round the
    * rank mass sitting on out-degree-0 nodes is split equally over ALL
    * nodes (share = danglingSum div |nodes|, same integer convention as
    * the per-edge division), conserving total mass.
    *
    * Scale shape: the edge relation stages ONCE as `(src, dst, deg)` —
    * the out-degree rides ON the edge row, so every round is ONE 8-byte-
    * key join (edges ⋈ ranks), a narrow per-edge projection, and a
    * map-side-combined sum keyed on dst; the old shape paid a second
    * (edge ⋈ deg) join in EVERY round for a value that never changes
    * across rounds. The rank frame is |nodes| rows (ids + one long).
    * With redistribution on, the round also semi-joins the rank frame
    * against the (staged, tiny) dangling-id set and crossJoins the
    * 1-row mass aggregate back in broadcast form — no driver-side
    * collect — and each round's rank frame is staged so the dual use
    * (contribs + dangling sum) doesn't fork the lineage exponentially.
    * Plan depth grows linearly in `iters` with no self-reference, so a
    * handful of rounds needs no checkpoint truncation (components()
    * iterates to an unbounded fixpoint and does need it — different
    * regime). */
  def pageRank(edges: DataFrame, iters: Int = 3, srcCol: String = "src",
      dstCol: String = "dst",
      redistributeDangling: Boolean = false): DataFrame = {
    val e0 = Stage.barrier(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct())
    val nodes = Stage.barrier(
      e0.select(col("src").as("id"))
        .union(e0.select(col("dst").as("id"))).distinct())
    val deg = e0.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("deg"))
    // the per-round join payload: degree joined onto the edge ONCE here,
    // instead of once per round
    val e = Stage.barrier(e0.join(deg, "src"))
    // nodes with no outgoing edge — only needed for redistribution
    lazy val dangling = Stage.barrier(
      nodes.join(deg.select(col("src").as("id")), Seq("id"), "left_anti"))
    // |nodes| as a long for the integer share; one cheap action on the
    // already-staged node frame (not a per-round collect)
    lazy val nNodes = nodes.count()
    var r = nodes.withColumn("rank", lit(1000000L))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).cast("long").as("s"))
      r = if (!redistributeDangling) {
        nodes.join(contribs, Seq("id"), "left")
          .select(col("id"),
            expr("150000 + (850 * coalesce(s, 0)) div 1000").as("rank"))
      } else {
        val share = broadcast(r.join(dangling, Seq("id"), "left_semi")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dsum"))
          .select(expr(s"dsum div $nNodes").as("share")))
        Stage.barrier(nodes.join(contribs, Seq("id"), "left")
          .crossJoin(share)
          .select(col("id"),
            expr("150000 + (850 * (coalesce(s, 0) + share)) div 1000")
              .as("rank")))
      }
    }
    r
  }

  /** Triangle count + local clustering coefficient per vertex over an
    * UNDIRECTED edge list `(a, b)` with `a < b`, distinct — e.g. the
    * verified near-dup pair graph, where clustering is the dedup-QA
    * signal: coefficients near 1000 mean coherent duplicate cliques,
    * low coefficients mean chain-shaped clusters whose transitive
    * closure risks gluing non-duplicates.
    *
    * Degree-ordered orientation (each edge directed from its lower-
    * (degree, id) endpoint) is the standard wedge bound: every wedge is
    * enumerated at its LOWEST-degree vertex, so per-vertex fanout in
    * the wedge self-join is O(max out-degree) = O(√|E|) on skewed
    * graphs instead of O(max degree) — the hub that would explode a
    * naive enumeration generates no wedges at all. Each triangle is
    * counted exactly once, then exploded to its three corners for the
    * per-vertex counts. Three equi-join shuffles, no window, no
    * collect; output is O(|V|). clustering_x1000 =
    * ⌊2000·n_tri / (deg·(deg−1))⌋, integer for oracle parity (degree-1
    * vertices report 0). */
  def triangleStats(edges: DataFrame): DataFrame = {
    // staged (Stage.barrier): e feeds the degree count, the orientation
    // join AND the triangle-closing join; deg feeds three branches;
    // oriented feeds both wedge self-join sides. Unstaged, each branch
    // re-runs the caller's whole upstream edge pipeline (the measured
    // 4x-recompute pattern from winnowCandidatePairs).
    val e = Stage.barrier(edges.select(col("a"), col("b")))
    val deg = Stage.barrier(
      e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("deg")))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = Stage.barrier(withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("src"),
      when(fwd, col("b")).otherwise(col("a")).as("dst")))
    // wedges at the low-degree corner; dst order makes the closing edge
    // the canonical (v1 < v2) form, so one join against `e` closes it
    val wedges = oriented.select(col("src"), col("dst").as("v1"))
      .join(oriented.select(col("src"), col("dst").as("v2")), "src")
      .filter(col("v1") < col("v2"))
    val tris = wedges.join(
      e.select(col("a").as("v1"), col("b").as("v2")), Seq("v1", "v2"))
    val perVertex = tris
      .select(explode(array(col("src"), col("v1"), col("v2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(perVertex, Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering_x1000",
        when(col("deg") >= 2,
          floor(col("n_tri") * 2000L / (col("deg") * (col("deg") - 1))))
          .otherwise(lit(0)).cast("long"))
  }
}
