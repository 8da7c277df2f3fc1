package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components (which lives
  * with its dedup consumer in Dedup.connectedComponents): triangle
  * counting — the standard cohesion/clustering-coefficient primitive.
  *
  * Scale design (100 TB of edges): the naive three-way self-join
  * explodes on high-degree nodes (a degree-d hub contributes d² wedge
  * rows). The classic fix (node-iterator++ / Schank's algorithm) is to
  * ORIENT each edge from its lower-degree endpoint to its
  * higher-degree endpoint: every wedge is then enumerated only at its
  * lowest-degree apex, bounding per-node work at (out-degree)² with
  * out-degree ≤ √(2m) after orientation — the m^{3/2} bound — instead
  * of (raw degree)². The wedge join and the closing-edge semi-join
  * shuffle on uniform edge keys.
  */
object Graph {

  /** Canonical undirected edge list: (u, v) with u < v, self-loops
    * dropped, duplicates collapsed. Input columns `src`, `dst`. */
  def canonicalEdges(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()

  /** Edge-count ceiling below which the triangle-closing edge set is
    * broadcast (two longs per row: ≤ ~64 MB of payload at the cap,
    * well under the 8 GB broadcast limit). The wedge table is
    * Σ C(out-deg, 2) rows — orders of magnitude larger than the edge
    * list — so a broadcast semi-join keeps it IN-PIPELINE (no
    * exchange, no sort of the wedge rows), while the sort-merge form
    * shuffles AND sorts every wedge. Above the cap the join falls
    * back to a shuffled-hash semi-join: still no sort, one wedge
    * exchange — the 100 TB shape. */
  private val BroadcastClosingMaxEdges = 4000000L

  /** Close wedges (a, b) against the canonical edge set: broadcast
    * semi-join when the edge list is small enough to ship, shuffled-
    * hash semi-join otherwise (never sort-merge — sorting the wedge
    * table is pure overhead for an existence probe). private[graft]
    * so the spec can pin both arms' equivalence directly. */
  private[graft] def closeWedges(wedges: DataFrame, closing: DataFrame,
      edgeCount: Long): DataFrame =
    if (edgeCount <= BroadcastClosingMaxEdges)
      wedges.join(broadcast(closing), Seq("a", "b"), "left_semi")
    else
      // hint the BUILD side: a LeftSemi builds right, so the hint must
      // sit on the closing relation to force the shuffled-hash strategy
      wedges.join(closing.hint("shuffle_hash"), Seq("a", "b"),
        "left_semi")

  /** Total triangle count over an undirected edge list (columns
    * `src`/`dst`; duplicates and orientation are normalized first).
    *
    * Wedges are enumerated at the degree-ordered apex: edges are
    * re-oriented low-degree → high-degree (ties by id), wedges built
    * by joining the oriented list with itself on the apex, and closed
    * by joining the (far1, far2) pair against the oriented edge set.
    * Every triangle is counted exactly once — each triangle has one
    * unique apex in the degree order. */
  def triangleCount(edges: DataFrame, src: String, dst: String): DataFrame = {
    // four consumers (degrees, orientation, closing set, edge count):
    // MEMORY_ONLY — evictable, recompute is deterministic
    val canon = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // materializes the cache (its first consumer pays this anyway) and
    // sizes the closing-join strategy below
    val edgeCount = canon.count()
    // degrees over the canonical list
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient each edge from lower (degree, id) to higher (degree, id).
    // shuffle_hash: the keys are uniform and no downstream op needs
    // sort order, so SMJ's two 600k-row sorts are pure overhead
    val withDeg = canon
      .hint("shuffle_hash")
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), Seq("u"))
      .hint("shuffle_hash")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("lo"), col("v").as("hi")))
        .otherwise(struct(col("v").as("lo"), col("u").as("hi")))
        .as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    // wedges at the apex: two oriented out-edges (apex -> a), (apex -> b)
    val left = oriented.select(col("lo").as("apex"), col("hi").as("a"))
    val right = oriented.select(col("lo").as("apex"), col("hi").as("b"))
    val wedges = left.hint("shuffle_hash").join(right, Seq("apex"))
      .filter(col("a") < col("b"))
    // close the wedge: (a, b) must be an edge (canonical: a < b) —
    // broadcast semi-join keeps the wedge table in-pipeline (r12)
    val closing = canon.select(col("u").as("a"), col("v").as("b"))
    val tris = closeWedges(wedges, closing, edgeCount)
    // node count lives IN the plan (single-row broadcast cross join) —
    // a separate driver .count() action would serialize an extra job
    // into every caller's critical path; the edge count is already on
    // the driver (the strategy-sizing count above)
    val out = tris.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      .select(col("n_nodes"), lit(edgeCount).as("n_edges"),
        col("n_triangles"))
      // eager 1-row materialization so the edge cache can release NOW
      // instead of leaking for the session lifetime (the r5 minhash
      // cache-release discipline)
      .localCheckpoint(eager = true)
    canon.unpersist()
    out
  }

  /** Per-node local clustering coefficient — the node-grain complement
    * of [[triangleCount]]'s global census: c(v) = 2·t(v) / (d(v)·(d(v)−1))
    * where t(v) = triangles through v, d(v) = degree (Watts–Strogatz
    * 1998). Same degree-ordered wedge enumeration (each triangle found
    * exactly once at its unique apex), then the found (a, b, apex)
    * triangle EXPLODES to its three corners so every node is credited
    * — one extra map + count vs the global form. The coefficient is a
    * single division of exact integers, so the doubles are
    * bit-identical cross-engine (the q144 discipline). Degree-1 and
    * isolated-in-canon nodes get c = 0.0 by convention.
    *
    * Scale: wedge count is Σ C(out-deg, 2) over the DEGREE-ORDERED
    * orientation — bounded by m^1.5 (Schank–Wagner), never deg².
    * One shuffle per join, counts map-side combined on node keys. */
  def clusteringCoefficient(edges: DataFrame, src: String,
      dst: String): DataFrame = {
    val canon = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // materializes the cache and sizes the closing-join strategy (r12)
    val edgeCount = canon.count()
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = canon
      .hint("shuffle_hash")
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), Seq("u"))
      .hint("shuffle_hash")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("lo"), col("v").as("hi")))
        .otherwise(struct(col("v").as("lo"), col("u").as("hi")))
        .as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    val left = oriented.select(col("lo").as("apex"), col("hi").as("a"))
    val right = oriented.select(col("lo").as("apex"), col("hi").as("b"))
    val wedges = left.hint("shuffle_hash").join(right, Seq("apex"))
      .filter(col("a") < col("b"))
    val closing = canon.select(col("u").as("a"), col("v").as("b"))
    val tris = closeWedges(wedges, closing, edgeCount)
    val perNode = tris
      .select(explode(array(col("apex"), col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("t"))
    val out = deg.join(perNode, Seq("n"), "left_outer")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        when(col("d") >= 2,
          (coalesce(col("t"), lit(0L)) * 2L).cast("double") /
            (col("d") * (col("d") - 1L)).cast("double"))
          .otherwise(lit(0.0)).as("coefficient"))
      // node-count rows, eagerly materialized so the edge cache
      // releases at return instead of leaking for the session
      .localCheckpoint(eager = true)
    canon.unpersist()
    out
  }

  /** Synchronous label propagation (community detection, Raghavan et
    * al. 2007) over an UNDIRECTED edge list, made fully deterministic:
    * each round every node adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label — integer counts and
    * integer labels, so (unlike the usual randomized-order LPA) the
    * result is bit-stable under any partitioning and reproducible in
    * plain SQL (the oracle unrolls the same rounds).
    *
    * Fixed `iterations` rather than convergence: synchronous LPA can
    * oscillate on bipartite-ish structures, so a caller-bounded round
    * count is the honest contract (and what the unrolled oracle can
    * check).
    *
    * Scale design: same loop discipline as [[bfsDistances]]/[[pageRank]]
    * — the both-directions adjacency is cached pre-partitioned on the
    * join key, so each round shuffles only the n-row label table plus
    * the (neighbor, label) count aggregate; per-round frames
    * localCheckpoint eagerly and superseded rounds release.
    *
    * @return (node, label) — label = a community representative id
    */
  def labelPropagation(
      edges: DataFrame,
      src: String,
      dst: String,
      iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations ($iterations) must be >= 0")
    val spark = edges.sparkSession
    // persisted: the sizing count below and BOTH unionAll branches of
    // the adjacency read it — unpersisted, the scan + distinct ran
    // three times (r12)
    val canon = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    val edgeCount = canon.count()
    val loopParts = math.max(1L,
      math.min(sessionParts, edgeCount / 125000L + 1L)).toInt
    val adj = canon.select(col("u").as("a"), col("v").as("b"))
      .unionAll(canon.select(col("v").as("a"), col("u").as("b")))
      .repartition(loopParts, col("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      var labels = adj.select(col("a").as("node")).distinct()
        .withColumn("label", col("node"))
        .localCheckpoint(eager = true)
      var i = 0
      while (i < iterations) {
        val counts = labels
          .join(adj, col("node") === col("a"))
          .groupBy(col("b"), col("label"))
          .agg(count(lit(1)).as("c"))
        val next = counts
          .groupBy(col("b"))
          .agg(min_by(col("label"),
            struct((-col("c")).as("nc"), col("label").as("l"))).as("label"))
          .select(col("b").as("node"), col("label"))
          .localCheckpoint(eager = true)
        Dedup.releaseCheckpoint(labels)
        labels = next
        i += 1
      }
      labels
    } finally {
      adj.unpersist(blocking = false)
      canon.unpersist(blocking = false)
    }
  }

  /** PageRank over a DIRECTED edge list, in scaled-integer arithmetic.
    *
    * Ranks are maintained as BIGINT multiples of 1/`scale` and every
    * per-round operation is integer (`div`) arithmetic:
    *
    *   r0(v)   = scale div n
    *   c(u->v) = r(u) div outdeg(u)            (per-edge contribution)
    *   r'(v)   = t + (dampNum * sum_in(v)) div dampDen
    *   t       = ((scale div n) * (dampDen - dampNum)) div dampDen
    *
    * Why integers: double-precision PageRank is order-dependent (the
    * in-neighbor sum changes with partitioning), so two runs — or two
    * engines — disagree in the low bits and no bit-exact oracle exists.
    * Integer division truncation makes every step associative-free and
    * exact, so the result is bit-stable across any cluster layout AND
    * reproducible in plain SQL (the oracle unrolls the same iterations
    * with `//`). Truncation under-counts each contribution by < 1/scale
    * — at scale 1e12 the drift is far below any ranking use.
    *
    * Dangling nodes (no out-edges) absorb mass: their rank is not
    * redistributed, matching the simple formulation the oracle mirrors.
    * Self-loops and duplicate edges are dropped/collapsed first.
    *
    * Scale design (100 TB of edges): same loop discipline as
    * [[bfsDistances]] — the (src, dst, outdeg) adjacency is cached
    * pre-partitioned by the join key so each round shuffles ONLY the
    * n-row rank table; per-round frames localCheckpoint eagerly and the
    * superseded round's blocks release as the loop advances. Rounds are
    * caller-fixed (`iterations`), so total work is iterations ×
    * (one rank join + one sum aggregate).
    *
    * @return (node, rank_scaled BIGINT) — rank_scaled / scale ~ PageRank
    */
  def pageRank(
      edges: DataFrame,
      src: String,
      dst: String,
      iterations: Int,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      teleportTo: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 0, s"iterations ($iterations) must be >= 0")
    require(scale > 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need scale > 0 and 0 <= dampNum <= dampDen (got $scale, $dampNum/$dampDen)")
    val spark = edges.sparkSession
    // four consumers below (nodes, edge count, out-degrees, adjacency):
    // persist, or the distinct recomputes for each
    val e = edges.select(col(src).cast("long").as("s"),
        col(dst).cast("long").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull &&
        col("s") =!= col("d"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nodes = e.select(col("s").as("node"))
      .unionAll(e.select(col("d").as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val n = nodes.count() // also materializes both caches
    if (n == 0) {
      nodes.unpersist(blocking = false)
      e.unpersist(blocking = false)
      return spark.emptyDataFrame.select(lit(0L).as("node"),
        lit(0L).as("rank_scaled")).limit(0)
    }
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    val outdeg = e.groupBy(col("s")).agg(count(lit(1)).as("od"))
    val edgeCount = e.count()
    val loopParts = math.max(1L,
      math.min(sessionParts, edgeCount / 125000L + 1L)).toInt
    // adjacency with the source's out-degree baked in, partitioned by
    // the per-round join key: rounds shuffle only the rank table
    val adj = e.join(outdeg, Seq("s"))
      .repartition(loopParts, col("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      // personalized variant (teleportTo = Some(source nodes)): both
      // the initial mass and the per-round teleport concentrate on the
      // source set — the trust-propagation / recommendation form
      // (Haveliwala 2002). Same integer arithmetic: |S| replaces n in
      // the teleport quantum, non-sources get 0, so the iterate stays
      // bit-exact and oracle-checkable.
      val srcSet = teleportTo.map(t =>
        broadcast(t.select(t.columns.head).toDF("node")
          .select(col("node").cast("long").as("node")).distinct()
          .localCheckpoint(eager = true)))
      val tBase = srcSet.map(_.count()).getOrElse(n)
      require(tBase > 0, "personalized teleport set is empty")
      val teleport = ((scale / tBase) * (dampDen - dampNum)) / dampDen
      def teleportCol(frame: DataFrame): DataFrame = srcSet match {
        case None => frame.withColumn("__tp", lit(teleport))
        case Some(ss) =>
          frame.join(ss.withColumnRenamed("node", "__sn"),
              col("node") === col("__sn"), "left")
            .withColumn("__tp",
              when(col("__sn").isNotNull, lit(teleport)).otherwise(lit(0L)))
            .drop("__sn")
      }
      var ranks = teleportCol(nodes)
        .withColumn("r", srcSet match {
          case None => lit(scale / n)
          case Some(_) =>
            when(col("__tp") > 0, lit(scale / tBase)).otherwise(lit(0L))
        })
        .select(col("node"), col("r"))
        .localCheckpoint(eager = true)
      var i = 0
      while (i < iterations) {
        val sums = ranks
          .join(adj, col("node") === col("s"))
          .select(col("d"), expr("r div od").as("c"))
          .groupBy(col("d")).agg(sum(col("c")).as("in_sum"))
        val next = teleportCol(nodes)
          .join(sums, col("node") === col("d"), "left")
          .select(col("node"),
            (col("__tp") +
              expr(s"($dampNum * coalesce(in_sum, 0L)) div $dampDen"))
              .as("r"))
          .localCheckpoint(eager = true)
        Dedup.releaseCheckpoint(ranks)
        ranks = next
        i += 1
      }
      ranks.select(col("node"), col("r").as("rank_scaled"))
    } finally {
      adj.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      e.unpersist(blocking = false)
    }
  }

  /** Multi-source BFS: minimum hop distance (<= maxHops) from any
    * source node to every reachable node, over an undirected edge list.
    * The traversal primitive behind reachability audits, influence
    * radii, and lineage-distance queries — and the third iterative
    * graph algorithm here after pointer-jumping and star-contraction
    * connected components.
    *
    * Per round, exactly the FRONTIER (nodes first reached in the
    * previous round) joins the adjacency list — not the full visited
    * set; newly seen neighbors anti-join away everything already
    * labeled. Rounds are bounded by maxHops, so join state and round
    * count are both caller-capped.
    *
    * Scale design (100 TB edge list): the adjacency list is cached
    * pre-partitioned by the join key, so each round's frontier join
    * shuffles ONLY the frontier (the CC edge-cache trick); per-round
    * frames localCheckpoint eagerly to cut lineage, and superseded
    * frontier checkpoints release as the loop advances. The per-round
    * convergence probe is a frontier count — one tiny action.
    *
    * @param sources one column `node`
    * @return (node, hops) — hops 0 for the sources themselves
    */
  /** Weighted multi-source shortest paths over a DIRECTED edge list
    * (Bellman-Ford with the frontier optimization): distances are
    * integer weights, so every round is exact min-arithmetic and the
    * result is bit-stable under any partitioning — the same
    * determinism contract as [[pageRank]]'s scaled integers, which is
    * what makes an unrolled-SQL oracle possible.
    *
    * Round invariant (what the oracle unrolls): after round i, `dist`
    * holds the minimum path cost using at most i edges from any
    * source. Only nodes IMPROVED in round i-1 propagate in round i
    * (the frontier optimization — relaxation work tracks the wave, not
    * the whole node set), and parallel edges collapse to their
    * cheapest at build time. With `maxIter` ≥ V-1 the result is the
    * true shortest-path distance; a smaller bound gives the
    * ≤-maxIter-edge distance, exactly and documentedly.
    *
    * Scale: the weighted adjacency is cached pre-partitioned on the
    * per-round join key; each round shuffles the frontier (improved
    * nodes only) plus a candidate min-aggregate bounded by the
    * frontier's out-edges — the [[bfsDistances]] loop discipline, with
    * weights. */
  def shortestPaths(
      edges: DataFrame,
      src: String,
      dst: String,
      weight: String,
      sources: DataFrame,
      maxIter: Int): DataFrame = {
    require(maxIter >= 0, s"maxIter ($maxIter) must be >= 0")
    val spark = edges.sparkSession
    // persisted: the sizing count and the adjacency repartition both
    // read it — unpersisted, the dedup aggregate ran twice (r12)
    val e0 = edges.select(col(src).cast("long").as("a"),
        col(dst).cast("long").as("b"), col(weight).cast("long").as("w"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b") && col("w") >= 0)
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    val edgeCount = e0.count()
    val loopParts = math.max(1L,
      math.min(sessionParts, edgeCount / 125000L + 1L)).toInt
    val adj = e0.repartition(loopParts, col("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      var dist = sources.select(col("node").cast("long").as("node"))
        .distinct()
        .withColumn("dist", lit(0L))
        .localCheckpoint(eager = true)
      var frontier = dist
      var iter = 0
      var frontierSize = frontier.count()
      while (frontierSize > 0 && iter < maxIter) {
        iter += 1
        val cand = frontier.join(adj, col("node") === col("a"))
          .select(col("b").as("node"), (col("dist") + col("w")).as("dist"))
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        val improved = cand
          .join(dist.withColumnRenamed("dist", "__old"), Seq("node"), "left")
          .filter(col("__old").isNull || col("dist") < col("__old"))
          .select(col("node"), col("dist"))
          .localCheckpoint(eager = true)
        val newDist = dist
          .join(improved.select(col("node")), Seq("node"), "left_anti")
          .unionAll(improved)
          .localCheckpoint(eager = true)
        Dedup.releaseCheckpoint(dist)
        Dedup.releaseCheckpoint(frontier)
        dist = newDist
        frontier = improved
        frontierSize = frontier.count()
      }
      if (frontierSize > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"shortestPaths: frontier non-empty after $maxIter rounds " +
            "(distances are the <=maxIter-edge minima, not final)")
      dist
    } finally {
      adj.unpersist(blocking = false)
      e0.unpersist(blocking = false)
    }
  }

  def bfsDistances(
      edges: DataFrame,
      src: String,
      dst: String,
      sources: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops ($maxHops) must be >= 0")
    val spark = edges.sparkSession
    // persisted: the sizing count and both adjacency branches read it
    // — unpersisted, the scan + distinct ran three times (r12)
    val canon = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // both directions, cached partitioned by the per-round join key
    val sessionParts =
      spark.sessionState.conf.numShufflePartitions.toLong
    val edgeCount = canon.count()
    val loopParts = math.max(1L,
      math.min(sessionParts, edgeCount / 125000L + 1L)).toInt
    val adj = canon.select(col("u").as("a"), col("v").as("b"))
      .unionAll(canon.select(col("v").as("a"), col("u").as("b")))
      .repartition(loopParts, col("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      var dist = sources.select(col("node").cast("long").as("node"))
        .distinct()
        .withColumn("hops", lit(0L))
        .localCheckpoint(eager = true)
      var frontier = dist
      var hop = 0L
      var frontierSize = frontier.count()
      while (frontierSize > 0 && hop < maxHops) {
        hop += 1
        val next = frontier
          .join(adj, col("node") === col("a"))
          .select(col("b").as("node"))
          .distinct()
          .join(dist, Seq("node"), "left_anti")
          .withColumn("hops", lit(hop))
          .localCheckpoint(eager = true)
        val newDist = dist.unionAll(next).localCheckpoint(eager = true)
        // both inputs are materialized in newDist/next: release the
        // superseded round state (keep adj until the finally). In
        // round 1 frontier IS dist — the second release is a no-op.
        Dedup.releaseCheckpoint(dist)
        Dedup.releaseCheckpoint(frontier)
        dist = newDist
        frontier = next
        frontierSize = frontier.count()
      }
      dist
    } finally {
      adj.unpersist(blocking = false)
      canon.unpersist(blocking = false)
    }
  }

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * Batagelj–Zaveršnik bulk variant): repeatedly drop every node
    * whose degree in the SURVIVING subgraph is < k until none remains
    * below k (or `maxRounds` peels, for the bounded form). Returns the
    * surviving nodes with their within-core degrees — the standard
    * "dense cohesive subgraph" census (spam-ring mining, community
    * cores, graph sparsification before expensive analytics).
    *
    * Edges are symmetrized, dedup'd, self-loop-free at build time, so
    * the input may be a directed or multi edge list.
    *
    * Round invariant (what the q147 oracle unrolls): after round i the
    * node set is exactly {v : deg(v) ≥ k in the subgraph induced by
    * round i−1's survivors} — a pure function of the input graph, so
    * the result is deterministic under any partitioning and the
    * bounded form replays as i nested SQL CTEs. `maxRounds =
    * Int.MaxValue` runs to the true k-core fixpoint (GraphSpec pins
    * triangle-plus-tail and bounded-vs-fixpoint agreement).
    *
    * Scale (100 TB edge list): each round is one degree aggregate
    * (map-side combined on node keys) plus two semi-joins that shrink
    * the edge frame; per-round frames localCheckpoint eagerly and the
    * superseded round releases (the [[shortestPaths]] loop
    * discipline). Rounds are bounded by the degeneracy ordering depth
    * — small for real graphs; the peel-everything-below-k bulk step
    * (not one-node-at-a-time) is what makes it O(rounds) shuffles. */
  def kCore(edges: DataFrame, src: String, dst: String, k: Int,
      maxRounds: Int = Int.MaxValue): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    require(maxRounds >= 1, s"maxRounds ($maxRounds) must be >= 1")
    val spark = edges.sparkSession
    val dir = edges.select(col(src).cast("long").as("a"),
        col(dst).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    var e = dir.unionAll(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(eager = true)
    val loopParts = math.max(1L, math.min(sessionParts,
      e.count() / 125000L + 1L)).toInt
    var round = 0
    var removed = 1L
    while (removed > 0 && round < maxRounds) {
      round += 1
      // the degree aggregate runs ONCE per round: checkpointed, then
      // both the survivor filter and the before-count read the
      // materialized result (an uncached deg would re-run the full
      // aggregate for the count — the one-aggregate-per-round cost
      // model would silently double)
      val deg = e.repartition(loopParts, col("a"))
        .groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
      val alive = deg.filter(col("deg") >= k).select(col("a").as("node"))
      removed = deg.count() - alive.count()
      if (removed > 0) {
        val kept = e
          .join(alive.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(alive.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint(eager = true)
        Dedup.releaseCheckpoint(e)
        e = kept
      }
      Dedup.releaseCheckpoint(deg)
    }
    // within-core degrees of the surviving subgraph
    e.groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** Common-neighbor census — the link-prediction feature
    * distribution (Liben-Nowell & Kleinberg 2003): how many node
    * pairs share exactly c neighbors, for each c. Wedges are
    * enumerated at their center; a center of degree d fans out to
    * C(d, 2) pairs, so the one scale hazard is a hub center —
    * `maxCenterDegree` drops over-degree centers WHOLESALE (the LSH
    * bucket-cap discipline: a bounded, documented undercount instead
    * of an unbounded join, and hubs' wedges are the least informative
    * for link prediction anyway). Work is Σ_{d ≤ cap} C(d, 2);
    * output is the tiny (c → n_pairs) histogram plus the capped-
    * center count so the undercount is always visible. */
  def commonNeighborCensus(edges: DataFrame, src: String, dst: String,
      maxCenterDegree: Int = 1000): DataFrame = {
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2 (got $maxCenterDegree)")
    val canon = canonicalEdges(edges, src, dst)
    val adj = canon.select(col("u").as("c"), col("v").as("x"))
      .unionAll(canon.select(col("v").as("c"), col("u").as("x")))
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
    val kept = adj.join(deg.filter(col("d") <= maxCenterDegree)
      .select(col("c")), Seq("c"))
    val pairs = kept.select(col("c"), col("x").as("a"))
      .hint("shuffle_hash")
      .join(kept.select(col("c"), col("x").as("b")), Seq("c"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
    val census = pairs.groupBy(col("cn")).agg(count(lit(1)).as("n_pairs"))
    census
      .crossJoin(broadcast(deg.agg(
        sum(when(col("d") > maxCenterDegree, 1L).otherwise(0L))
          .as("n_capped_centers"))))
      .select(col("cn"), col("n_pairs"), col("n_capped_centers"))
  }

  /** Resource-allocation link-prediction index (Zhou, Lü, Zhang 2009):
    * for each candidate pair (a, b) sharing at least `minCn` common
    * neighbors, RA = Σ_z 1/deg(z) over the common neighbors z — the
    * degree-penalized cousin of common-neighbor counting (a shared
    * hub says less than a shared leaf). Adamic–Adar's 1/log(deg)
    * variant is deliberately NOT the gate form: log is libm
    * ulp-territory, 1/deg is one correctly-rounded division. The
    * per-pair sum folds in SORTED order (sort_array + aggregate), so
    * the double is bit-stable under any partitioning and matches the
    * oracle's list_sort fold.
    *
    * Scale: identical shape to [[commonNeighborCensus]] — the
    * center-degree cap bounds the per-center pair fan-out at
    * C(maxCenterDegree, 2) and hub centers are dropped (counted,
    * auditable); the pair aggregate carries a cn count and a bounded
    * term list (≤ the cap). minCn prunes the long cn=1 tail before
    * output. */
  def resourceAllocation(edges: DataFrame, src: String, dst: String,
      maxCenterDegree: Int = 1000, minCn: Int = 2): DataFrame = {
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2 (got $maxCenterDegree)")
    val canon = canonicalEdges(edges, src, dst)
    val adj = canon.select(col("u").as("c"), col("v").as("x"))
      .unionAll(canon.select(col("v").as("c"), col("u").as("x")))
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
    val kept = adj.join(deg.filter(col("d") <= maxCenterDegree), Seq("c"))
    pairs(kept)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"),
        aggregate(sort_array(collect_list(col("term"))), lit(0.0),
          (acc, x) => acc + x).as("ra"))
      .filter(col("cn") >= minCn)
  }

  /** Candidate pairs at the capped centers, each carrying the center's
    * 1/deg contribution. */
  private def pairs(kept: DataFrame): DataFrame =
    kept.select(col("c"), col("x").as("a"),
        (lit(1.0) / col("d").cast("double")).as("term"))
      .hint("shuffle_hash")
      .join(kept.select(col("c"), col("x").as("b")), Seq("c"))
      .filter(col("a") < col("b"))

  /** Katz centrality, EXACT truncated form: katz(u) = Σ_{k=1..K}
    * α^k · walks_k(u), where walks_k(u) is the number of length-k
    * walks ending at u (all-ones seed). With α = 1/2 every term is an
    * exact dyadic float (walk counts are exact BIGINTs as long as
    * they stay under 2^53 — caller's documented budget; the count
    * iteration itself is pure integer), and the K-term sum is a fixed
    * ascending-k expression — bit-identical cross-engine, unlike the
    * usual power-iteration-to-convergence form. Spark-side each round
    * is one edge join + one aggregate (the PageRank cost class).
    *
    * Overflow bound: walk counts grow ~degree^k, so a web-scale hub
    * (10⁷-degree at k ≥ 3) would exceed Long range. Each round
    * therefore sums in exact DECIMAL(38,0) — unoverflowable below
    * 10^38 — and SATURATES the per-node count at `satCap`
    * (default 2^53, the dyadic-double exactness budget): a saturated
    * node's walks_last/katz are lower-bound estimates, never wrapped
    * garbage, and nodes below the cap stay bit-exact. GraphSpec plants
    * a hub against a tiny cap to pin the clamp and the
    * default-cap ≡ exact equivalence.
    *
    * @return (node, w1..wK as columns are internal; output is
    *         (node, walks_K, katz)) */
  def katzCentrality(edges: DataFrame, src: String, dst: String,
      rounds: Int, satCap: Long = 1L << 53): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds out of range ($rounds)")
    require(satCap >= 1L, s"satCap must be positive ($satCap)")
    val spark = edges.sparkSession
    // persisted: the sizing count and both adjacency branches read it
    // — unpersisted, the scan + distinct ran three times (r12)
    val canon = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    val loopParts = math.max(1L, math.min(sessionParts,
      canon.count() / 125000L + 1L)).toInt
    // cached PRE-PARTITIONED on the per-round join key (`b`): each
    // round then shuffles only the n-row walk table, not the edge
    // list — the pageRank loop discipline (r12)
    val adj = canon.select(col("u").as("a"), col("v").as("b"))
      .unionAll(canon.select(col("v").as("a"), col("u").as("b")))
      .repartition(loopParts, col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = adj.select(col("a").as("node")).distinct()
    var v = nodes.withColumn("w", lit(1L))
      .localCheckpoint(eager = true)
    var acc = nodes.select(col("node"), lit(0.0).as("katz"))
    // the lazy accumulator references EVERY round's walk table, so the
    // per-round checkpoints are released only after `out` materializes
    val rounds_ = scala.collection.mutable.ArrayBuffer(v)
    for (k <- 1 to rounds) {
      // exact wide sum + saturating clamp: inputs are ≤ satCap ≤ 2^53
      // (DECIMAL(28,0)-safe), the DECIMAL(38,0) sum cannot overflow
      // below 10^38 ≈ 2^126 total walks, and the clamp keeps the long
      // cast exact — a hub exceeding the cap reads satCap, not a wrap
      val wideSum = sum(col("w")
        .cast(org.apache.spark.sql.types.DecimalType(28, 0)))
      val capDec = lit(satCap)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
      val next = adj.join(v.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(least(wideSum, capDec).cast("long").as("w"))
        .localCheckpoint(eager = true)
      rounds_ += next
      v = next
      // α^k = 2^-k: exact dyadic scaling of an exact integer count
      acc = acc.join(v, Seq("node"), "left_outer")
        .select(col("node"),
          (col("katz") + coalesce(col("w").cast("double"), lit(0.0)) /
            lit(math.pow(2.0, k))).as("katz"))
    }
    val out = acc.join(v.withColumnRenamed("w", "walks_last"),
        Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(col("walks_last"), lit(0L)).as("walks_last"),
        col("katz"))
      .localCheckpoint(eager = true)
    rounds_.foreach(Dedup.releaseCheckpoint)
    adj.unpersist(blocking = false)
    canon.unpersist(blocking = false)
    out
  }

  /** Closeness centrality for a seed set via multi-source BFS: the
    * frontier state is (seed, node, hops) so each seed's shortest
    * distances evolve independently in ONE shared per-round join
    * against the adjacency (k seeds do not cost k traversals — the
    * composite-key frontier rides the same shuffle). Exact integer
    * distances; closeness = (n_reach − 1) / Σdist is the one final
    * division (NULL for isolated seeds). Per-round checkpoint-release
    * discipline as in [[bfsDistances]].
    *
    * @return one row per seed: (seed, n_reach, sum_dist, closeness) */
  def closenessCentrality(edges: DataFrame, src: String, dst: String,
      seeds: Seq[Long], maxHops: Int): DataFrame = {
    require(seeds.nonEmpty && maxHops >= 0, "need seeds and maxHops >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    // persisted: the sizing count and both adjacency branches read it
    // — unpersisted, the scan + distinct ran three times (r12)
    val canon = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    val edgeCount = canon.count()
    val loopParts = math.max(1L,
      math.min(sessionParts, edgeCount / 125000L + 1L)).toInt
    // cached PRE-PARTITIONED on the per-round join key — the
    // bfsDistances/pageRank loop discipline (this operator alone
    // persisted the adjacency unpartitioned, so every round's frontier
    // join re-shuffled the full edge list; r12)
    val adj = canon.select(col("u").as("a"), col("v").as("b"))
      .unionAll(canon.select(col("v").as("a"), col("u").as("b")))
      .repartition(loopParts, col("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var dist = seeds.distinct.toDF("seed")
        .select(col("seed"), col("seed").as("node"),
          lit(0L).as("hops"))
        .localCheckpoint(eager = true)
      var frontier = dist
      var hop = 0L
      var frontierSize = frontier.count()
      while (frontierSize > 0 && hop < maxHops) {
        hop += 1
        val next = frontier
          .join(adj, col("node") === col("a"))
          .select(col("seed"), col("b").as("node"))
          .distinct()
          .join(dist, Seq("seed", "node"), "left_anti")
          .withColumn("hops", lit(hop))
          .localCheckpoint(eager = true)
        val newDist = dist.unionAll(next).localCheckpoint(eager = true)
        Dedup.releaseCheckpoint(dist)
        Dedup.releaseCheckpoint(frontier)
        dist = newDist
        frontier = next
        frontierSize = frontier.count()
      }
      dist.groupBy(col("seed"))
        .agg(count(lit(1)).as("n_reach"), sum(col("hops")).as("sum_dist"))
        .select(col("seed"), col("n_reach"), col("sum_dist"),
          when(col("sum_dist") > 0L,
            (col("n_reach") - 1L).cast("double") /
              col("sum_dist").cast("double")).as("closeness"))
    } finally {
      adj.unpersist(blocking = false)
      canon.unpersist(blocking = false)
    }
  }

  /** Weisfeiler–Lehman color refinement (1-WL): round-0 color is the
    * node degree; each round recolors a node with
    * md5(ownColor ∥ '|' ∥ sorted neighbor colors) — the canonical
    * graph-structure fingerprint (isomorphic neighborhoods get equal
    * colors; the per-round color-class partition refines
    * monotonically). md5 of an identical string is engine-portable,
    * the neighbor list is sorted before hashing, and colors are ASCII
    * hex/digits where lexical = binary order — so every color is
    * bit-identical in the DuckDB oracle's unrolled restatement.
    *
    * Scale: each round is one join of the edge list against the n-row
    * color table (shuffle on node id) plus one aggregate — the
    * PageRank cost class; rounds are a small constant. The returned
    * union references EVERY round's color table, so each round is
    * eagerly checkpointed and released only AFTER the final union is
    * itself checkpointed (the katzCentrality discipline) — no round
    * recomputes from lineage at consumption time, and no cached block
    * outlives the call.
    *
    * @return (round, node, color) for rounds 0..rounds */
  def wlRefine(edges: DataFrame, src: String, dst: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 16, s"rounds out of range ($rounds)")
    val spark = edges.sparkSession
    // persisted: the sizing count and both adjacency branches read it
    // — unpersisted, the scan + distinct ran three times (r12)
    val canon = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    val loopParts = math.max(1L, math.min(sessionParts,
      canon.count() / 125000L + 1L)).toInt
    // cached PRE-PARTITIONED on the per-round join key (`x`): each
    // round then shuffles only the n-row color table, not the edge
    // list — the pageRank loop discipline (r12)
    val adj = canon.select(col("u").as("node"), col("v").as("x"))
      .unionAll(canon.select(col("v").as("node"), col("u").as("x")))
      .repartition(loopParts, col("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var colors = adj.groupBy(col("node"))
      .agg(count(lit(1)).cast("string").as("color"))
      .localCheckpoint(eager = true)
    val rounds_ = scala.collection.mutable.ArrayBuffer(colors)
    var out = colors.withColumn("round", lit(0))
    for (r <- 1 to rounds) {
      val nbColors = colors.select(col("node").as("x"),
        col("color").as("xcolor"))
      val sig = adj.join(nbColors, Seq("x"))
        .groupBy(col("node"))
        .agg(array_join(sort_array(collect_list(col("xcolor"))), ",")
          .as("sig"))
      colors = sig.join(colors, Seq("node"))
        .select(col("node"),
          md5(concat(col("color"), lit("|"), col("sig"))).as("color"))
        .localCheckpoint(eager = true)
      rounds_ += colors
      out = out.unionAll(colors.withColumn("round", lit(r)))
    }
    val result = out.select(col("round"), col("node"), col("color"))
      .localCheckpoint(eager = true)
    rounds_.foreach(Dedup.releaseCheckpoint)
    adj.unpersist(blocking = false)
    canon.unpersist(blocking = false)
    result
  }

  /** Neighborhood Jaccard similarity for EXISTING edges — the
    * link-strength feature J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| with
    * the endpoints themselves excluded from each other's
    * neighborhood (an edge (u,v) puts v in N(u); u and v can never be
    * common neighbors of the pair, so both sides subtract their
    * mutual membership). Common neighbors come from the wedge-at-
    * center join (work Σ C(d,2), bounded by `maxCenterDegree` — the
    * commonNeighborCensus discipline); degrees broadcast back onto
    * the edge list; the union size is |N(u)|+|N(v)|−2−cn by
    * inclusion–exclusion. Edges with no common neighbor keep J = 0
    * via the left join. All counts exact; J is one division.
    *
    * @return (u, v, cn, du, dv, jaccard) for every canonical edge */
  def neighborhoodJaccard(edges: DataFrame, src: String, dst: String,
      maxCenterDegree: Int = 1000): DataFrame = {
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2 (got $maxCenterDegree)")
    val canon = canonicalEdges(edges, src, dst)
    val adj = canon.select(col("u").as("c"), col("v").as("x"))
      .unionAll(canon.select(col("v").as("c"), col("u").as("x")))
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
    val kept = adj.join(deg.filter(col("d") <= maxCenterDegree)
      .select(col("c")), Seq("c"))
    val cn = kept.select(col("c"), col("x").as("a"))
      .hint("shuffle_hash")
      .join(kept.select(col("c"), col("x").as("b")), Seq("c"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
    canon
      .join(cn, col("u") === col("a") && col("v") === col("b"),
        "left")
      .select(col("u"), col("v"),
        coalesce(col("cn"), lit(0L)).as("cn"))
      // deg is |V|-sized — shuffle joins, never broadcast
      .join(deg.select(col("c").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("c").as("v"), col("d").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("cn"), col("du"), col("dv"),
        // du+dv−2−cn = 0 only for an isolated edge (both endpoints
        // degree 1): define J = 0 rather than 0/0
        when(col("du") + col("dv") - lit(2L) - col("cn") > 0L,
          col("cn").cast("double") /
            (col("du") + col("dv") - lit(2L) - col("cn")).cast("double"))
          .otherwise(lit(0.0)).as("jaccard"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over all edge STUBS (each undirected edge
    * contributes both orientations, making the pair distribution
    * symmetric — Σx = Σy and Σx² = Σy², so three integer moments
    * suffice and r = (mΣxy − (Σx)²) / (mΣx² − (Σx)²)). All moments
    * are exact BIGINTs; r is one identical double derivation. Scale:
    * the degree table is |V|-sized — two shuffle joins onto the edge
    * list, never broadcast; Σd² ≤ m·d_max² bounds the BIGINT budget
    * (hub degree 10⁶ on 10⁹ stubs stays under 2⁶³).
    * @return one row: (m2 = 2|E|, sx, sx2, sxy, r) */
  def degreeAssortativity(edges: DataFrame, src: String,
      dst: String): DataFrame = {
    val canon = canonicalEdges(edges, src, dst)
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val j = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val stubs = j.select(col("du").as("x"), col("dv").as("y"))
      .unionAll(j.select(col("dv").as("x"), col("du").as("y")))
    def d(c: String): Column = col(c).cast("double")
    stubs.agg(count(lit(1)).as("m2"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("m2"), col("sx"), col("sx2"), col("sxy"),
        ((d("m2") * d("sxy") - d("sx") * d("sx")) /
          (d("m2") * d("sx2") - d("sx") * d("sx"))).as("r"))
  }

  /** Strongly connected components of a DIRECTED graph — the
    * forward-backward min-label coloring (the distributed FW-BW/
    * coloring family; Slota et al. 2014 is the survey reference):
    * per outer round, compute
    *
    *   cf(v) = min(ancestors(v) ∪ {v})     (min-label propagated
    *                                        ALONG edges, to fixpoint)
    *   cb(v) = min(descendants(v) ∪ {v})   (same, against edges)
    *
    * A node with cf(v) == cb(v) == m has m both reaching and reached
    * by v ⇒ v ∈ SCC(m); all of SCC(m)'s members share both labels
    * (ancestor/descendant sets agree up to the SCC), and no outside
    * node can match — so each round peels COMPLETE SCCs, at minimum
    * the one containing the globally smallest remaining id (whose
    * cf = cb = itself). Peeling is sound: any path between two
    * members of a surviving SCC through a peeled node would put that
    * node in their SCC — contradiction — so intra-SCC paths never
    * leave the remaining subgraph.
    *
    * A TRIM phase runs before and between coloring rounds: nodes
    * with no remaining in-edges or out-edges lie on no cycle —
    * singleton SCCs peeled by two anti-joins per round — which
    * erodes the tendril chains that coloring would otherwise peel
    * one node per double-fixpoint round (the FW-BW-Trim composition).
    *
    * Each fixpoint is the [[Dedup.connectedComponents]] loop shape:
    * min-propagate + pointer jump (labels are node ids; the label of
    * my label is an ancestor-of-ancestor, so jumping stays sound),
    * label-sum convergence (labels only decrease), localCheckpoint
    * lineage cuts, edge cache partitioned by the per-round join key.
    * Outer rounds are data-dependent (adversarial id layouts peel
    * slowly — maxOuter guards; random graphs peel in a few rounds:
    * trim eats the tendrils, coloring takes the giant SCC).
    * @return (node, scc) — scc = min member id of the component */
  def stronglyConnectedComponents(edges: DataFrame, src: String,
      dst: String, maxOuter: Int = 50,
      maxInner: Int = 50): DataFrame = {
    require(maxOuter > 0 && maxInner > 0, "iteration budgets must be > 0")
    val spark = edges.sparkSession
    val e0 = edges.select(col(src).cast("long").as("s"),
        col(dst).cast("long").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull)
      .distinct()
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    // self-loops don't affect SCC membership; drop after counting
    var remEdges = e0.filter(col("s") =!= col("d"))
      .localCheckpoint(eager = true)
    var remNodes = e0.select(col("s").as("node"))
      .unionAll(e0.select(col("d").as("node"))).distinct()
      .localCheckpoint(eager = true)
    val loopParts = math.max(1L, math.min(sessionParts,
      remEdges.count() / 250000L + 1L)).toInt
    def labelSum(df: DataFrame): Any =
      df.agg(sum(col("l").cast("decimal(38,0)"))).head().get(0)
    // min-label fixpoint over (s -> d) propagation direction
    def minFix(prop: DataFrame, nodes: DataFrame): DataFrame = {
      val edgesByS = prop.repartition(loopParts, col("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      try {
        var lab = nodes.withColumn("l", col("node"))
          .localCheckpoint(eager = true)
        var prevSum: Any = null
        var converged = false
        var i = 0
        while (!converged && i < maxInner) {
          val pushed = edgesByS
            .join(lab.select(col("node").as("s"), col("l")), "s")
            .select(col("d").as("node"), col("l"))
          val stepped = pushed.union(lab)
            .repartition(loopParts, col("node"))
            .groupBy(col("node")).agg(min(col("l")).as("l"))
          val next = stepped
            .join(lab.select(col("node").as("l"),
              col("l").as("__l2")), Seq("l"), "left")
            .select(col("node"),
              coalesce(col("__l2"), col("l")).as("l"))
            .localCheckpoint(eager = true)
          val s2 = labelSum(next)
          converged = s2 == prevSum
          prevSum = s2
          Dedup.releaseCheckpoint(lab)
          lab = next
          i += 1
        }
        lab
      } finally { edgesByS.unpersist(blocking = false) }
    }
    var done: DataFrame = null
    var outer = 0
    var remaining = remNodes.count()
    // TRIM phase (the FW-BW-Trim standard): a node with no in-edges
    // or no out-edges in the remaining subgraph is on no cycle — a
    // singleton SCC. Peeling those with two cheap anti-joins per
    // round erodes tendrils/chains that the coloring phase would
    // otherwise peel one node per (expensive, double-fixpoint)
    // round; re-run between colorings because removing an SCC
    // exposes new tendrils.
    def trim(): Unit = {
      var more = remaining > 0
      var t = 0
      while (more && t < maxInner) {
        val onCycleCandidates = remNodes
          .join(remEdges.select(col("d").as("node")).distinct(),
            Seq("node"), "left_semi")
          .join(remEdges.select(col("s").as("node")).distinct(),
            Seq("node"), "left_semi")
          .localCheckpoint(eager = true)
        val kept = onCycleCandidates.count()
        if (kept == remaining) more = false
        else {
          val trimmed = remNodes
            .join(onCycleCandidates, Seq("node"), "left_anti")
            .select(col("node"), col("node").as("scc"))
            .localCheckpoint(eager = true)
          done = if (done == null) trimmed else done.unionAll(trimmed)
          val nextEdges = remEdges
            .join(onCycleCandidates.select(col("node").as("s")), "s")
            .join(onCycleCandidates.select(col("node").as("d")), "d")
            .select(col("s"), col("d")).localCheckpoint(eager = true)
          Dedup.releaseCheckpoint(remEdges)
          Dedup.releaseCheckpoint(remNodes)
          remEdges = nextEdges
          remNodes = onCycleCandidates
          remaining = kept
        }
        t += 1
      }
    }
    trim()
    while (remaining > 0 && outer < maxOuter) {
      val cf = minFix(remEdges, remNodes)
      val cb = minFix(
        remEdges.select(col("d").as("s"), col("s").as("d")), remNodes)
      val joined = cf.select(col("node"), col("l").as("lf"))
        .join(cb.select(col("node"), col("l").as("lb")), "node")
        .localCheckpoint(eager = true)
      val peeled = joined.filter(col("lf") === col("lb"))
        .select(col("node"), col("lf").as("scc"))
        .localCheckpoint(eager = true)
      done = if (done == null) peeled else done.unionAll(peeled)
      val rem = joined.filter(col("lf") =!= col("lb"))
        .select(col("node")).localCheckpoint(eager = true)
      val nextEdges = remEdges
        .join(rem.select(col("node").as("s")), "s")
        .join(rem.select(col("node").as("d")), "d")
        .select(col("s"), col("d")).localCheckpoint(eager = true)
      Dedup.releaseCheckpoint(remEdges)
      Dedup.releaseCheckpoint(remNodes)
      Dedup.releaseCheckpoint(joined)
      remEdges = nextEdges
      remNodes = rem
      remaining = remNodes.count()
      trim() // a peeled SCC exposes fresh tendrils
      outer += 1
    }
    if (remaining > 0) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"SCC peel budget exhausted after $maxOuter rounds " +
          s"with $remaining nodes unresolved; labeling them by cf")
      done = done.unionAll(minFix(remEdges, remNodes)
        .select(col("node"), col("l").as("scc")))
    }
    done
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge
    * list — UNNORMALIZED exact-integer iterate:
    *
    *   a_k(v) = Σ_{u→v} h_{k−1}(u)      (authority = sum of in-hubs)
    *   h_k(v) = Σ_{v→w} a_k(w)          (hub = sum of out-authorities)
    *
    * initialized h_0 ≡ 1. Why no normalization: the textbook L2 step
    * introduces a sqrt whose accumulation order makes the fixpoint
    * engine- and partition-dependent; the unnormalized k-round values
    * are path counts (a_k(v) = #paths of shape (→)·(←→)^{k−1} ending
    * at v) — exact BIGINTs whose RANKING equals the normalized
    * ranking, bit-stable and oracle-checkable (the oracle unrolls the
    * same rounds as CTEs). Overflow budget: values grow by a factor
    * ≤ max-degree·breadth per half-round — with n ≤ 10⁵ nodes,
    * n^(2·iterations) < 2⁶³ caps iterations at 3; the default 2 is
    * the classic "hubs emerge" depth. Scale shape = [[pageRank]]:
    * the deduped adjacency is cached pre-partitioned on the source
    * key; each half-round shuffles only the n-row score table.
    * @return (node, auth, hub) after `iterations` full rounds */
  def hits(edges: DataFrame, src: String, dst: String,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 3,
      s"iterations ($iterations) must be in [1, 3] — unnormalized " +
        "scores grow geometrically; see the overflow budget note")
    val spark = edges.sparkSession
    val e = edges.select(col(src).cast("long").as("s"),
        col(dst).cast("long").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull &&
        col("s") =!= col("d"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nodes = e.select(col("s").as("node"))
      .unionAll(e.select(col("d").as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    nodes.count() // materialize both caches
    val sessionParts = spark.sessionState.conf.numShufflePartitions.toLong
    val edgeCount = e.count()
    val loopParts = math.max(1L,
      math.min(sessionParts, edgeCount / 125000L + 1L)).toInt
    val adj = e.repartition(loopParts, col("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      var hub = nodes.withColumn("h", lit(1L))
        .localCheckpoint(eager = true)
      var auth: DataFrame = null
      var i = 0
      while (i < iterations) {
        val a = nodes.join(
            hub.join(adj, col("node") === col("s"))
              .groupBy(col("d")).agg(sum(col("h")).as("__a")),
            col("node") === col("d"), "left")
          .select(col("node"), coalesce(col("__a"), lit(0L)).as("a"))
          .localCheckpoint(eager = true)
        val h = nodes.join(
            a.join(adj, col("node") === col("d"))
              .groupBy(col("s")).agg(sum(col("a")).as("__h")),
            col("node") === col("s"), "left")
          .select(col("node"), coalesce(col("__h"), lit(0L)).as("h"))
          .localCheckpoint(eager = true)
        if (auth != null) Dedup.releaseCheckpoint(auth)
        Dedup.releaseCheckpoint(hub)
        auth = a
        hub = h
        i += 1
      }
      auth.join(hub, Seq("node"))
        .select(col("node"), col("a").as("auth"), col("h").as("hub"))
    } finally {
      adj.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      e.unpersist(blocking = false)
    }
  }

  /** Dyad census of a directed graph (Holland & Leinhardt 1970): every
    * unordered node pair is Mutual (both directions), Asymmetric (one)
    * or Null; reciprocity = M/(M+A) — the standard directedness
    * diagnostic (a crawl link graph with high reciprocity behaves like
    * an undirected one for ranking). Exact integers throughout: M from
    * one self-join of the deduped edge list against its reverse, A by
    * subtraction from the canonical pair count, N from C(n,2) — never
    * a pair enumeration. Reciprocity is the single float division
    * (0/0 ⇒ NULL on an edgeless graph, both engines).
    * @return one row: (n_nodes, n_edges_directed, mutual, asym, nulls,
    *   reciprocity) */
  def dyadCensus(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges.select(col(src).as("s"), col(dst).as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull &&
        col("s") =!= col("d"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val und = canonicalEdges(e, "s", "d")
    val mutual = e.join(e.select(col("d").as("s"), col("s").as("d")),
        Seq("s", "d"), "left_semi")
      .filter(col("s") < col("d")) // one row per mutual pair
    val nNodes = e.select(col("s").as("n"))
      .unionAll(e.select(col("d").as("n"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val counts = e.agg(count(lit(1)).as("n_edges_directed"))
      .crossJoin(broadcast(und.agg(count(lit(1)).as("__pairs"))))
      .crossJoin(broadcast(mutual.agg(count(lit(1)).as("mutual"))))
      .crossJoin(broadcast(nNodes))
    val out = counts.select(col("n_nodes"), col("n_edges_directed"),
      col("mutual"), (col("__pairs") - col("mutual")).as("asym"),
      expr("n_nodes * (n_nodes - 1) div 2").as("__allpairs"),
      col("__pairs"))
      .select(col("n_nodes"), col("n_edges_directed"), col("mutual"),
        col("asym"), (col("__allpairs") - col("__pairs")).as("nulls"),
        when(col("__pairs") > 0, col("mutual").cast("double") /
          col("__pairs").cast("double")).as("reciprocity"))
    out
  }

  /** Rich-club coefficient (Zhou & Mondragón 2004; Colizza et al.
    * 2006, uncorrected form): for each degree threshold k,
    * φ(k) = 2·E_k / (N_k·(N_k−1)) over the undirected graph, where
    * N_k counts nodes of degree > k and E_k the edges between them —
    * "do the hubs form their own dense club?". One degree aggregate,
    * then per threshold a semi-join-restricted edge count (thresholds
    * are a literal handful, the fan-out is |ks|). Exact integers; φ
    * is the single division per row (NULL when N_k < 2).
    * @return per k: (k, n_rich, e_rich, phi) */
  def richClub(edges: DataFrame, src: String, dst: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "need at least one threshold")
    val und = canonicalEdges(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("__deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val perK = ks.sorted.map { k =>
      val rich = deg.filter(col("__deg") > k).select(col("n"))
      val nRich = rich.agg(count(lit(1)).as("n_rich"))
      val eRich = und
        .join(rich.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(rich.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .agg(count(lit(1)).as("e_rich"))
      nRich.crossJoin(broadcast(eRich))
        .select(lit(k).as("k"), col("n_rich"), col("e_rich"),
          when(col("n_rich") >= 2,
            lit(2.0) * col("e_rich").cast("double") /
              (col("n_rich").cast("double") *
                (col("n_rich").cast("double") - 1.0))).as("phi"))
    }
    perK.reduce(_ unionAll _)
  }

  /** Newman modularity of a GIVEN node partition (Newman & Girvan
    * 2004) — the quality score for communities from LPA/CC/attribute
    * grouping: Q = Σ_c [e_c/m − (d_c/2m)²] over the canonical
    * undirected edge set. Everything upstream of the final division is
    * EXACT integer arithmetic: per-community intra-edge counts e_c,
    * degree sums d_c, and the numerator contribution
    * 4m·e_c − d_c² over the common denominator 4m² — so the score is
    * partitioning-invariant and oracle-exact. Overflow budget:
    * requires m ≤ 1.5e9 (then d_c ≤ 2m keeps d_c² and 4m² under
    * 2⁶³); beyond that, rerun per community subset or lift q_num to
    * DECIMAL — enforced by a require, not silent wrap.
    *
    * Shape at scale: two edge→assignment equi-joins (the assignment
    * re-partitions by node once), two community-sized aggregates, and
    * a 1-row m broadcast. Nodes missing from `assignment` drop with
    * their edges (document-your-input contract).
    * @return per community: (<commCol>, n_nodes, intra_edges,
    *   degree_sum, q_num, contribution) with contribution =
    *   q_num / 4m² the single float op */
  def modularity(edges: DataFrame, src: String, dst: String,
      assignment: DataFrame, nodeCol: String, commCol: String)
      : DataFrame = {
    val e = canonicalEdges(edges, src, dst)
    val a = assignment.select(col(nodeCol).as("__n"),
      col(commCol).as("__c")).distinct()
    val labeled = e
      .join(a.select(col("__n").as("u"), col("__c").as("__cu")), Seq("u"))
      .join(a.select(col("__n").as("v"), col("__c").as("__cv")), Seq("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // materializes the cache; m is a bounded driver scalar (one long)
    val m = labeled.count()
    require(m <= 1500000000L,
      s"modularity overflow budget: m = $m > 1.5e9 (see scaladoc)")
    val intra = labeled.filter(col("__cu") === col("__cv"))
      .groupBy(col("__cu").as("__c"))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = labeled.select(col("u").as("__n"), col("__cu").as("__c"))
      .unionAll(labeled.select(col("v").as("__n"), col("__cv").as("__c")))
      .groupBy(col("__c")).agg(count(lit(1)).as("degree_sum"))
    val sizes = a.groupBy(col("__c")).agg(count(lit(1)).as("n_nodes"))
    sizes
      .join(deg, Seq("__c"), "left")
      .join(intra, Seq("__c"), "left")
      .select(col("__c").as(commCol), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        coalesce(col("degree_sum"), lit(0L)).as("degree_sum"))
      .withColumn("q_num",
        lit(4L) * lit(m) * col("intra_edges") -
          col("degree_sum") * col("degree_sum"))
      .withColumn("contribution",
        col("q_num").cast("double") /
          (lit(4.0) * lit(m.toDouble) * lit(m.toDouble)))
  }
}
