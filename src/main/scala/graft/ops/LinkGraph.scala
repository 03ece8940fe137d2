package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
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
  * unrolled-CTE DuckDB oracle reproduce it to rounding (the only
  * cross-engine noise is contribution-sum ORDER, ~1e-15, absorbed by
  * the caller's final round).
  *
  * Implementation follows [[Dedup.connectedComponents]]: the iteration
  * runs on RDDs with an explicit HashPartitioner — every per-round join
  * (edges⋈rank, nodes⋈contrib, the dangling subtract) is co-partitioned
  * and narrow, the only exchange per round is the contribution
  * reduceByKey over the EDGE frame (the shape every distributed
  * PageRank pays), and the partition count scales with the graph
  * (~500k edges/partition), not the parent query's shuffle.partitions.
  * A DataFrame formulation paid 10-100× in per-round Catalyst/AQE
  * planning on small graphs and needed per-round lineage cuts. The
  * per-round dangling mass is a scalar `sum` action (never a node
  * collect). */
object LinkGraph {

  /** (node, rank) after `iters` rounds. `edges` needs (src, dst)
    * columns; self-loops and duplicate edges are dropped (simple-graph
    * convention, which keeps outdeg consistent with the contribution
    * sum). */
  def pagerank(edges: DataFrame, damping: Double = 0.85,
               iters: Int = 10): DataFrame = {
    require(iters >= 1 && damping > 0.0 && damping < 1.0)
    val spark = edges.sparkSession
    val e: RDD[(Long, Long)] = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst") &&
        col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e.count()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 500000L).toInt + 1))
    val part = new HashPartitioner(parts)

    val outdeg: RDD[(Long, Int)] = e.mapValues(_ => 1)
      .reduceByKey(part, _ + _).persist(StorageLevel.MEMORY_AND_DISK)
    // (src, (dst, deg)) co-partitioned on src — the per-round join input
    val eDeg: RDD[(Long, (Long, Int))] = e.join(outdeg, part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes: RDD[(Long, Unit)] = e
      .flatMap { case (a, b) => Iterator(a, b) }
      .map((_, ())).reduceByKey(part, (a, _) => a)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = nodes.count()

    var rank: RDD[(Long, Double)] = nodes.mapValues(_ => 1.0 / nNodes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var it = 0
    while (it < iters) {
      // dangling mass: rank on nodes with no out-edges (narrow: both
      // sides on `part`); the one scalar action per round
      val dm = rank.subtractByKey(outdeg, part).values.sum()
      val contrib = eDeg.join(rank, part) // narrow
        .map { case (_, ((dst, deg), r)) => (dst, r / deg) }
        .reduceByKey(part, _ + _) // THE per-round exchange (edge-sized)
      val next = nodes.leftOuterJoin(contrib, part) // narrow
        .mapValues { case (_, inc) =>
          (1.0 - damping) / nNodes +
            damping * (inc.getOrElse(0.0) + dm / nNodes) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      val prev = rank
      rank = next
      prev.unpersist(false)
      it += 1
    }
    val out = {
      import spark.implicits._
      rank.toDF("n", "r")
    }
    // materialize before dropping the inputs the lineage reads through
    out.persist(StorageLevel.MEMORY_AND_DISK).count()
    e.unpersist(false); outdeg.unpersist(false)
    eDeg.unpersist(false); nodes.unpersist(false)
    out
  }

  /** Personalized PageRank: the teleport distribution concentrates on
    * `seeds` instead of spreading uniformly — the crawl-prioritization
    * and related-page score (how reachable is each node from the pages
    * you trust). Same co-partitioned loop as [[pagerank]] — one
    * edge-sized reduceByKey per round — with two differences: the
    * restart vector `s` (1/|seeds| on seeds, 0 elsewhere; a broadcast
    * set, never a join) replaces 1/n everywhere, including the
    * dangling-mass redistribution, and the walk starts AT the seeds
    * (`r0 = s`). Nodes outside the seed component converge to 0, which
    * is the point. Seeds with no edges still appear in the output. */
  def personalizedPagerank(edges: DataFrame, seeds: Seq[Long],
                           damping: Double = 0.85,
                           iters: Int = 10): DataFrame = {
    require(seeds.nonEmpty, "personalizedPagerank needs at least one seed")
    require(iters >= 1 && damping > 0.0 && damping < 1.0)
    val spark = edges.sparkSession
    val seedSet = seeds.toSet
    val bcSeeds = spark.sparkContext.broadcast(seedSet)
    val sMass = 1.0 / seedSet.size
    val e: RDD[(Long, Long)] = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst") &&
        col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e.count()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 500000L).toInt + 1))
    val part = new HashPartitioner(parts)
    val outdeg: RDD[(Long, Int)] = e.mapValues(_ => 1)
      .reduceByKey(part, _ + _).persist(StorageLevel.MEMORY_AND_DISK)
    val eDeg: RDD[(Long, (Long, Int))] = e.join(outdeg, part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes: RDD[(Long, Unit)] = e
      .flatMap { case (a, b) => Iterator(a, b) }
      .union(spark.sparkContext.parallelize(seeds))
      .map((_, ())).reduceByKey(part, (a, _) => a)
      .persist(StorageLevel.MEMORY_AND_DISK)
    def sOf(n: Long): Double = if (bcSeeds.value(n)) sMass else 0.0
    var rank: RDD[(Long, Double)] = nodes
      .map { case (n, _) => (n, sOf(n)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    var it = 0
    while (it < iters) {
      val dm = rank.subtractByKey(outdeg, part).values.sum()
      val contrib = eDeg.join(rank, part)
        .map { case (_, ((dst, deg), r)) => (dst, r / deg) }
        .reduceByKey(part, _ + _)
      val next = nodes.leftOuterJoin(contrib, part)
        .map { case (n, (_, inc)) =>
          val s = sOf(n)
          (n, (1.0 - damping) * s +
            damping * (inc.getOrElse(0.0) + dm * s)) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      val prev = rank
      rank = next
      prev.unpersist(false)
      it += 1
    }
    val out = {
      import spark.implicits._
      rank.toDF("n", "r")
    }
    out.persist(StorageLevel.MEMORY_AND_DISK).count()
    e.unpersist(false); outdeg.unpersist(false)
    eDeg.unpersist(false); nodes.unpersist(false)
    out
  }

  /** HITS hubs & authorities (Kleinberg): the mutual-reinforcement
    * iteration — `auth(n) = Σ_{m→n} hub(m)`, `hub(n) = Σ_{n→m} auth(n's
    * targets)` — L1-normalized each half-step so the fixpoint is
    * scale-free and every intermediate stays bounded (L1 rather than
    * the classical L2: a sum is one exchange and mirrors exactly in the
    * SQL oracle, and the RANKING fixpoint is the same). Hub scores
    * separate link-soup pages (high hub, low auth) from linked-to
    * content (high auth) — the web-spam signal PageRank alone misses.
    *
    * Execution shape: the forward and reverse edge lists are hash
    * co-partitioned once; each round is two edge-sized reduceByKey
    * exchanges (auth pull, hub pull) and two scalar sums. */
  def hits(edges: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1)
    val spark = edges.sparkSession
    val e: RDD[(Long, Long)] = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst") &&
        col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e.count()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 500000L).toInt + 1))
    val part = new HashPartitioner(parts)
    val fwd = e.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val rev = e.map { case (s, d) => (d, s) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val nodes: RDD[(Long, Unit)] = e
      .flatMap { case (a, b) => Iterator(a, b) }
      .map((_, ())).reduceByKey(part, (a, _) => a)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = nodes.count()
    var hub: RDD[(Long, Double)] = nodes.mapValues(_ => 1.0 / nNodes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var auth: RDD[(Long, Double)] = hub
    var it = 0
    while (it < iters) {
      val authRaw = fwd.join(hub, part)
        .map { case (_, (dst, h)) => (dst, h) }
        .reduceByKey(part, _ + _)
      val authSum = authRaw.values.sum()
      val nextAuth = nodes.leftOuterJoin(authRaw, part)
        .mapValues { case (_, v) =>
          if (authSum == 0.0) 0.0 else v.getOrElse(0.0) / authSum }
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hubRaw = rev.join(nextAuth, part)
        .map { case (_, (src, a)) => (src, a) }
        .reduceByKey(part, _ + _)
      val hubSum = hubRaw.values.sum()
      val nextHub = nodes.leftOuterJoin(hubRaw, part)
        .mapValues { case (_, v) =>
          if (hubSum == 0.0) 0.0 else v.getOrElse(0.0) / hubSum }
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (ph, pa) = (hub, auth)
      hub = nextHub
      auth = nextAuth
      if (it > 0) { ph.unpersist(false); pa.unpersist(false) }
      it += 1
    }
    val out = {
      import spark.implicits._
      hub.join(auth, part)
        .map { case (n, (h, a)) => (n, h, a) }
        .toDF("n", "hub", "auth")
    }
    out.persist(StorageLevel.MEMORY_AND_DISK).count()
    e.unpersist(false); fwd.unpersist(false); rev.unpersist(false)
    nodes.unpersist(false)
    out
  }

  /** k-hop BFS frontier over the directed link graph: every node
    * reachable from `seeds` within `maxHops`, with its hop distance —
    * crawl-frontier planning (which pages a depth-k crawl from the seed
    * set would fetch) and the graph-distance feature in one op.
    *
    * Same execution shape as [[pagerank]]: co-partitioned RDD rounds,
    * the only per-round exchange the edge-sized frontier expansion
    * reduceByKey; rounds stop early when a frontier is empty. All
    * arithmetic is INTEGER (min-distance monoid), so the result is
    * bit-exact for any engine — the oracle is an unrolled min-join per
    * hop. Output: (n, dist). */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val spark = edges.sparkSession
    val e: RDD[(Long, Long)] = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e.count()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 500000L).toInt + 1))
    val part = new HashPartitioner(parts)
    val adj = e.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)

    var dist: RDD[(Long, Int)] = seeds.select(col("n").cast("long"))
      .distinct().rdd.map(r => (r.getLong(0), 0))
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = dist
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty()) {
      val next = adj.join(frontier, part) // narrow
        .map { case (_, (dst, d)) => (dst, d + 1) }
        .reduceByKey(part, (a: Int, b: Int) => math.min(a, b)) // THE per-hop exchange
      // new nodes only: already-settled distances are already minimal
      frontier = next.subtractByKey(dist, part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // NARROW merge: both sides are already on `part`, and their key
      // sets are disjoint by construction, so a co-partitioned full
      // outer join folds the frontier in without an exchange — the
      // previous union().partitionBy(part) discarded the partitioner
      // and re-shuffled the ENTIRE settled set every hop (O(V) bytes
      // per hop instead of O(frontier))
      dist = dist.fullOuterJoin(frontier, part)
        .mapValues { case (d, f) => d.getOrElse(f.get) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      hop += 1
    }
    val out = {
      import spark.implicits._
      dist.toDF("n", "dist")
    }
    out.persist(StorageLevel.MEMORY_AND_DISK).count()
    e.unpersist(false); adj.unpersist(false)
    out
  }
}
