package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analysis for crawl curation: damped PageRank over a
  * (src, dst) edge table — the classic page-quality prior (rank-weighted
  * sampling and spam down-weighting both key on it), next to
  * [[Dedup.connectedComponents]] on the graph-op shelf.
  *
  * Fixed-iteration damped PageRank with dangling-mass redistribution:
  *
  *   r_{k+1}(n) = (1-d)/N + d · (Σ_{(m,n)∈E} r_k(m)/outdeg(m) + D_k/N)
  *
  * where D_k is the rank mass sitting on dangling (no-outlink) nodes.
  * Rank mass is conserved at 1 every round (asserted in the spec), and
  * a FIXED iteration count (not convergence-to-tolerance) keeps the
  * result a deterministic function of the graph — which is what lets an
  * unrolled-CTE DuckDB oracle reproduce it to rounding.
  *
  * Scale shape: the edge table joins rank on `src` and aggregates
  * contributions on `dst` — one partial-aggregated exchange per round
  * over the EDGE frame, the same shape every distributed PageRank
  * (Pregel, GraphX) pays. Edges and out-degrees are computed once and
  * persisted; each round's rank frame is cut to a materialized
  * `localCheckpoint` — with plain persist the logical plan still NESTS
  * one InMemoryRelation per round and Spark's plan-string/canonicalize
  * work goes superlinear in the round count (measured: a 10-round loop
  * over a 5-node graph spent minutes in explainString). The per-round
  * dangling mass is a scalar aggregate (never a node collect). */
object LinkGraph {

  /** (node, rank) after `iters` rounds. `edges` needs (src, dst)
    * columns; self-loops and duplicate edges are dropped (simple-graph
    * convention, and what keeps outdeg consistent with the contribution
    * sum). */
  def pagerank(edges: DataFrame, damping: Double = 0.85,
               iters: Int = 10): DataFrame = {
    require(iters >= 1 && damping > 0.0 && damping < 1.0)
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("n")).union(e.select(col("dst").as("n")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = nodes.count()
    val withDeg = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val srcs = withDeg.select(col("src").as("n")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var rank = nodes.select(col("n"),
      (lit(1.0) / nNodes).as("r")).localCheckpoint(true)
    var it = 0
    while (it < iters) {
      // dangling mass: rank sitting on nodes with no out-edges
      val dm = rank.join(srcs, Seq("n"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0))).head().getDouble(0)
      val inc = withDeg.join(rank.withColumnRenamed("n", "src"), "src")
        .groupBy(col("dst").as("n"))
        .agg(sum(col("r") / col("deg")).as("inc"))
      rank = nodes.join(inc, Seq("n"), "left")
        .select(col("n"),
          ((lit(1.0) - damping) / nNodes +
            lit(damping) * (coalesce(col("inc"), lit(0.0)) + lit(dm) / nNodes))
            .as("r"))
        .localCheckpoint(true) // materialize + CUT lineage (see scaladoc)
      it += 1
    }
    nodes.unpersist(false)
    withDeg.unpersist(false)
    srcs.unpersist(false)
    rank
  }
}
