package graft

import graft.operators.Graph

/** Triangle counting: known fixtures + randomized equivalence with a
  * naive reference count. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst").head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("triangle fixtures: K4, path, star, shared-edge pair") {
    // K4: every 3-subset is a triangle -> 4
    count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      ) shouldBe ((4L, 6L, 4L))
    // path 1-2-3-4: no triangles
    count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) shouldBe ((4L, 3L, 0L))
    // star: hub with 4 leaves, no closing edges
    count(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))) shouldBe ((5L, 4L, 0L))
    // two triangles sharing edge 1-2
    count(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      ) shouldBe ((4L, 5L, 2L))
  }

  test("duplicate, reversed, and self-loop edges are normalized away") {
    count(Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L), (3L, 1L))
      ) shouldBe ((3L, 3L, 1L))
  }

  test("triangle count matches naive enumeration on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val edges = (for {
      u <- 0 until n; v <- (u + 1) until n if rnd.nextDouble() < 0.15
    } yield (u.toLong, v.toLong)).toVector
    val es = edges.toSet
    val naive = (for {
      x <- 0 until n; y <- (x + 1) until n; z <- (y + 1) until n
      if es.contains((x.toLong, y.toLong)) &&
        es.contains((x.toLong, z.toLong)) && es.contains((y.toLong, z.toLong))
    } yield 1).size.toLong
    val (_, nEdges, tris) = count(edges)
    nEdges shouldBe edges.size.toLong
    tris shouldBe naive
    naive should be > 0L // fixture sanity: the graph actually has triangles
  }

  // ------------------------------------------------------------- BFS

  private def bfs(
      edges: Seq[(Long, Long)],
      sources: Seq[Long],
      maxHops: Int): Map[Long, Long] = {
    val e = edges.toDF("src", "dst")
    val s = sources.toDF("node")
    Graph.bfsDistances(e, "src", "dst", s, maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfs labels a chain with hop counts from multiple sources") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    bfs(chain, Seq(1L, 9L), maxHops = 10) shouldBe Map(
      1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      9L -> 0L, 8L -> 1L)
  }

  test("bfs respects the hop cap and traverses undirected") {
    val chain = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)) // reversed dirs
    bfs(chain, Seq(1L), maxHops = 2) shouldBe Map(
      1L -> 0L, 2L -> 1L, 3L -> 2L)
  }

  test("bfs takes the minimum over converging paths") {
    // 1-2-3-4 and a shortcut 1-4; plus a cycle back edge
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 1L))
    bfs(g, Seq(1L), maxHops = 5) shouldBe Map(
      1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L)
  }

  test("bfs matches a reference search on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val edges = (for {
      u <- 0 until n; v <- (u + 1) until n if rnd.nextDouble() < 0.04
    } yield (u.toLong, v.toLong)).toVector
    val sources = Seq(0L, 30L)
    val maxHops = 4
    // reference: level-synchronous BFS over an adjacency map
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources.toSet
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .diff(dist.keySet)
      dist = dist ++ frontier.map(_ -> h.toLong)
    }
    bfs(edges, sources, maxHops) shouldBe dist
  }

  // ----------------------------------------------- label propagation

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: the same synchronous most-frequent/min-tie recurrence. */
  private def lpaRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (canon ++ canon.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("label propagation matches the reference recurrence") {
    // two triangles bridged by one edge: communities keep their min ids
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    for (iters <- Seq(1, 2, 3)) {
      withClue(s"iters=$iters: ") { lpa(g, iters) shouldBe lpaRef(g, iters) }
    }
    // after 2 rounds the two triangles carry distinct dominant labels
    val l2 = lpa(g, 2)
    l2(1L) should not be l2(6L)
  }

  test("label propagation matches the reference on a seeded random graph") {
    val rnd = new scala.util.Random(23)
    val n = 60
    val edges = (for {
      u <- 0 until n; v <- (u + 1) until n if rnd.nextDouble() < 0.05
    } yield (u.toLong, v.toLong)).toVector
    lpa(edges, 3) shouldBe lpaRef(edges, 3)
  }

  // ------------------------------------------------------- pagerank

  private def pr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: the same scaled-integer recurrence, driver-side. */
  private def prRef(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val n = nodes.size
    val od = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = ((scale / n) * 15L) / 100L
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).view.mapValues(
        _.map(p => r(p._1) / od(p._1)).sum).toMap
      r = nodes.map(v =>
        v -> (teleport + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("pagerank matches the integer recurrence on a hand graph") {
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1 (3 gains most mass), plus
    // a dangling sink 4 (absorbs mass; no out-edges)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L))
    for (iters <- Seq(0, 1, 3)) {
      withClue(s"iters=$iters: ") { pr(g, iters) shouldBe prRef(g, iters) }
    }
    // ranking sanity after convergence-ish: 3 above 2 (two in-edges vs one)
    val r3 = pr(g, 3)
    r3(3L) should be > r3(2L)
  }

  test("pagerank matches the reference on a seeded random digraph") {
    val rnd = new scala.util.Random(11)
    val n = 50
    val edges = (for {
      u <- 0 until n; v <- 0 until n if u != v && rnd.nextDouble() < 0.06
    } yield (u.toLong, v.toLong)).toVector
    pr(edges, 4) shouldBe prRef(edges, 4)
  }

  test("pagerank normalizes duplicates/self-loops and handles empty input") {
    val g = Seq((1L, 2L), (1L, 2L), (1L, 1L), (2L, 1L))
    pr(g, 2) shouldBe prRef(g, 2)
    Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"),
      "src", "dst", 2).count() shouldBe 0L
  }

  test("shortestPaths: weighted relaxation beats fewer-hop costlier paths") {
    // 1 -> 2 (w=10) direct, but 1 -> 3 -> 4 -> 2 costs 3; directed so
    // 2 cannot reach back; parallel edge keeps the cheaper weight
    val edges = Seq(
      (1L, 2L, 10L), (1L, 2L, 12L), // parallel: min wins
      (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L),
      (2L, 5L, 2L), (9L, 1L, 1L)    // 9 -> 1 not traversed from source 1
    ).toDF("src", "dst", "w")
    val sources = Seq(1L).toDF("node")
    val got = Graph.shortestPaths(edges, "src", "dst", "w", sources,
        maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L, 5L -> 5L)
  }

  test("shortestPaths honors the maxIter edge bound exactly") {
    // chain 1 -> 2 -> 3 -> 4, unit weights: with maxIter = 2 node 4 is
    // unreached and distances are the <=2-edge minima
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.shortestPaths(chain, "src", "dst", "w",
        Seq(1L).toDF("node"), maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
  }

  test("shortestPaths matches a reference Dijkstra on a seeded graph") {
    var seed = 24681357L
    def next(m: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.abs(seed % m).toInt
    }
    val n = 40
    val edges = Seq.fill(160)((next(n).toLong, next(n).toLong,
      (next(9) + 1).toLong)).filter(e => e._1 != e._2)
    val sources = Seq(0L, 7L)
    val got = Graph.shortestPaths(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", sources.toDF("node"), maxIter = n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: multi-source Dijkstra on the min-weight simple graph
    val adj = edges.groupBy(e => (e._1, e._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).min) }
      .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
    val dist = scala.collection.mutable.Map(sources.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue(
      sources.map(s => (0L, s)): _*)(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (dist(u) == d)
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > d + w)) {
            dist(v) = d + w; pq.enqueue((d + w, v))
          }
        }
    }
    got shouldBe dist.toMap
  }

  test("kCore: 2-core of triangle-plus-tail is exactly the triangle") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val core = Graph.kCore(e, "a", "b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    core shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
  }

  test("kCore: fixpoint equals a sufficiently deep bounded peel; " +
      "every surviving node meets the degree bar") {
    // seeded pseudo-random graph with a dense core and sparse fringe
    val e = (0 until 400).map { i =>
      ((i * 31 % 40).toLong, (i * 17 % 40 + (i % 7)).toLong)
    }.toDF("a", "b")
    val fix = Graph.kCore(e, "a", "b", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deep = Graph.kCore(e, "a", "b", k = 4, maxRounds = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    deep shouldBe fix
    all(fix.values) should be >= 4L
    // one bounded peel is a SUPERSET of the fixpoint (peeling shrinks)
    val one = Graph.kCore(e, "a", "b", k = 4, maxRounds = 1)
      .collect().map(_.getLong(0)).toSet
    fix.keySet.subsetOf(one) shouldBe true
  }

  test("commonNeighborCensus: hand-computed histogram + center cap") {
    import spark.implicits._
    // star 0-{1,2,3} plus edge 1-2: pairs via center 0: (1,2) (1,3)
    // (2,3); pair (1,2) also closes via centers 1? no — centers are
    // SHARED NEIGHBORS: 1 and 2 share {0}; 1,3 share {0}; 2,3 share
    // {0}; 0 and 1 share {2}; 0 and 2 share {1}; 0,3 share {}
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L))
      .toDF("a", "b")
    val out = Graph.commonNeighborCensus(e, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 5L) // five pairs, each sharing exactly 1
    // cap: center 0 has degree 3 -> cap 2 removes ALL its wedges,
    // leaving only centers 1 and 2 (degree 2 each)
    val capped = Graph.commonNeighborCensus(e, "a", "b",
      maxCenterDegree = 2).collect()
    capped.map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(1L -> 2L) // (0,2) via center 1 and (0,1) via center 2
    capped(0).getLong(2) shouldBe 1L // one capped center, visible
  }

  test("neighborhoodJaccard: triangle, leaf edge, isolated edge") {
    import spark.implicits._
    // triangle 1-2-3 with a leaf 4 on node 1, plus isolated edge 8-9
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (8L, 9L))
      .toDF("a", "b")
    val got = Graph.neighborhoodJaccard(e, "a", "b")
      .orderBy("u", "v")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // edge (1,2): cn={3}, N(1)\{2}={2?}: du=3, dv=2 -> J = 1/(3+2-2-1)=0.5
    got.toSeq shouldBe Seq(
      (1L, 2L, 1L, 3L, 2L, 0.5),
      (1L, 3L, 1L, 3L, 2L, 0.5),
      (1L, 4L, 0L, 3L, 1L, 0.0), // leaf: no common neighbors
      (2L, 3L, 1L, 2L, 2L, 1.0), // union beyond endpoints is just {1}
      (8L, 9L, 0L, 1L, 1L, 0.0)) // isolated edge: J pinned to 0
  }

  test("scc: cycles, chains, multi-round peel, disconnected pieces") {
    import spark.implicits._
    def sccMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
      Graph.stronglyConnectedComponents(
        edges.toDF("s", "d"), "s", "d")
        .as[(Long, Long)].collect().toMap
    // two 3-cycles bridged one-way: each cycle one SCC
    sccMap(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 4L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    // adversarial peel order: small id 1 feeds cycle {2,3}; round 1
    // peels only node 1 (cf(2)=1 but cb(2)=2), round 2 peels {2,3}
    sccMap(Seq((1L, 2L), (2L, 3L), (3L, 2L))) shouldBe
      Map(1L -> 1L, 2L -> 2L, 3L -> 2L)
    // pure DAG: every node is its own singleton SCC
    sccMap(Seq((1L, 2L), (2L, 3L), (1L, 3L))) shouldBe
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
    // 2-cycle with both directions listed + a self-loop edge
    sccMap(Seq((7L, 8L), (8L, 7L), (9L, 9L), (9L, 7L))) shouldBe
      Map(7L -> 7L, 8L -> 7L, 9L -> 9L)
  }

  test("hits: directed path and star have hand-computed path counts") {
    import spark.implicits._
    // directed path 1->2->3: h0=1 everywhere
    // a1 = in-deg: (1:0, 2:1, 3:1); h1(v)=sum a1 over out: (1:1, 2:1, 3:0)
    // a2(v)=sum h1 over in: (1:0, 2:1, 3:1); h2: (1:1, 2:1, 3:0)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    Graph.hits(path, "s", "d", iterations = 2).orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq shouldBe
      Seq((1L, 0L, 1L), (2L, 1L, 1L), (3L, 1L, 0L))
    // in-star: 1..3 -> 0. a1(0)=3; h1(leaves)=3; a2(0)=9; h2(leaves)=9
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("s", "d")
    Graph.hits(star, "s", "d", iterations = 2).orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq shouldBe
      Seq((0L, 9L, 0L), (1L, 0L, 9L), (2L, 0L, 9L), (3L, 0L, 9L))
    // self-loops and duplicate edges are dropped before iterating
    val messy = Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 3L)).toDF("s", "d")
    Graph.hits(messy, "s", "d", iterations = 1).orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq shouldBe
      Seq((1L, 0L, 1L), (2L, 1L, 1L), (3L, 1L, 0L))
  }

  test("degreeAssortativity: star graph r=-1, path P3 r=-1") {
    import spark.implicits._
    val star = (2L to 6L).map(i => (1L, i)).toDF("a", "b")
    val rs = Graph.degreeAssortativity(star, "a", "b").head()
    rs.getLong(0) shouldBe 10L // 2|E|
    rs.getDouble(4) shouldBe -1.0
    val p3 = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val rp = Graph.degreeAssortativity(p3, "a", "b").head()
    // stubs x=(1,2,2,1): m2=4 sx=6 sx2=10 sxy=2*4=8
    rp.getLong(1) shouldBe 6L
    rp.getLong(2) shouldBe 10L
    rp.getLong(3) shouldBe 8L
    rp.getDouble(4) shouldBe -1.0 // (32-36)/(40-36)
  }

  test("modularity: two triangles + bridge, hand-computed Q") {
    import spark.implicits._
    // triangles {0,1,2} and {3,4,5}, bridge 2-3: m=7,
    // e_c=3 each, d_c=7 each -> q_num = 4*7*3 - 49 = 35 per community
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L),
      (3L, 5L), (2L, 3L)).toDF("s", "d")
    val a = (0L to 5L).map(n => (n, n / 3)).toDF("node", "comm")
    val got = Graph.modularity(e, "s", "d", a, "node", "comm")
      .orderBy("comm")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    got shouldBe Seq(
      (0L, 3L, 3L, 7L, 35L, 35.0 / 196.0),
      (1L, 3L, 3L, 7L, 35L, 35.0 / 196.0))
    // the all-in-one-community partition scores exactly 0
    val one = (0L to 5L).map(n => (n, 0L)).toDF("node", "comm")
    Graph.modularity(e, "s", "d", one, "node", "comm")
      .head().getLong(4) shouldBe 0L // 4*7*7 - 14^2
  }

  test("modularity: community with no intra edges gets negative q_num") {
    import spark.implicits._
    val e = Seq((0L, 1L)).toDF("s", "d")
    val a = Seq((0L, 10L), (1L, 20L)).toDF("node", "comm")
    val got = Graph.modularity(e, "s", "d", a, "node", "comm")
      .orderBy("comm")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    got shouldBe Seq(
      (10L, 1L, 0L, 1L, -1L, -1.0 / 4.0),
      (20L, 1L, 0L, 1L, -1L, -1.0 / 4.0))
  }

  test("dyadCensus: mutual / asym / null counts and reciprocity") {
    import spark.implicits._
    // 4 nodes: 1<->2 mutual, 1->3 asym, self-loop and dup dropped
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (4L, 4L),
      (3L, 4L)).toDF("s", "d")
    val r = Graph.dyadCensus(e, "s", "d").head()
    r.getLong(0) shouldBe 4L // nodes (4 only via self-loop? no: 3->4)
    r.getLong(1) shouldBe 4L // distinct directed, loop dropped
    r.getLong(2) shouldBe 1L // mutual {1,2}
    r.getLong(3) shouldBe 2L // asym {1,3}, {3,4}
    r.getLong(4) shouldBe 3L // C(4,2)=6 - 3 connected
    r.getDouble(5) shouldBe 1.0 / 3.0
  }

  test("richClub: hubs densify, small k covers whole graph") {
    import spark.implicits._
    // triangle {1,2,3} plus pendant 4-1: degrees 3,2,2,1
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L)).toDF("s", "d")
    val got = Graph.richClub(e, "s", "d", Seq(0, 1, 2))
      .orderBy("k").collect()
    // k=0: all 4 nodes, 4 edges -> phi = 8/12
    got(0).getLong(1) shouldBe 4L
    got(0).getLong(2) shouldBe 4L
    got(0).getDouble(3) shouldBe 2.0 * 4 / (4.0 * 3)
    // k=1: nodes {1,2,3} (deg>1), triangle -> phi = 1
    got(1).getLong(1) shouldBe 3L
    got(1).getLong(2) shouldBe 3L
    got(1).getDouble(3) shouldBe 1.0
    // k=2: only node 1 -> phi NULL
    got(2).getLong(1) shouldBe 1L
    got(2).getLong(2) shouldBe 0L
    got(2).isNullAt(3) shouldBe true
  }

  test("katzCentrality: exact dyadic walk sums on a path") {
    import spark.implicits._
    // path 1-2-3: w1 = deg = (1,2,1); w2 = (2,2,2)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val r = Graph.katzCentrality(e, "s", "d", rounds = 2)
      .orderBy("node").collect()
    r.map(_.getLong(1)).toSeq shouldBe Seq(2L, 2L, 2L) // walks_last
    r(0).getDouble(2) shouldBe 1.0 // 1/2 + 2/4
    r(1).getDouble(2) shouldBe 1.5 // 2/2 + 2/4
    r(2).getDouble(2) shouldBe 1.0
  }

  test("katzCentrality: hub walk counts saturate at satCap, never wrap") {
    import spark.implicits._
    // star with 6 leaves: hub w1 = 6, leaves w1 = 1;
    // w2(hub) = 6, w2(leaf) = 6. With satCap = 4 the hub clamps to 4
    // each round, so w2(leaf) = w1(hub clamped) = 4.
    val e = (1L to 6L).map(l => (0L, l)).toDF("s", "d")
    val r = Graph.katzCentrality(e, "s", "d", rounds = 2, satCap = 4L)
      .orderBy("node").collect()
    r(0).getLong(1) shouldBe 4L // hub: clamped both rounds
    r(0).getDouble(2) shouldBe (4.0 / 2 + 4.0 / 4)
    (1 to 6).foreach { i =>
      r(i).getLong(1) shouldBe 4L // leaf round-2 sees the clamped hub
      r(i).getDouble(2) shouldBe (1.0 / 2 + 4.0 / 4)
    }
    // default cap is inert on a safe fixture: identical to the exact path
    val exact = Graph.katzCentrality(e, "s", "d", rounds = 2)
      .orderBy("node").collect()
    exact(0).getLong(1) shouldBe 6L
    exact(1).getLong(1) shouldBe 6L
    exact(0).getDouble(2) shouldBe (6.0 / 2 + 6.0 / 4)
  }

  test("closenessCentrality: path graph distances and horizon cut") {
    import spark.implicits._
    // path 1-2-3-4: from seed 1, dists 0,1,2,3 -> closeness 3/6
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val r = Graph.closenessCentrality(e, "s", "d", Seq(1L, 9L),
      maxHops = 6).orderBy("seed").collect()
    r(0).getLong(1) shouldBe 4L
    r(0).getLong(2) shouldBe 6L
    r(0).getDouble(3) shouldBe 0.5
    // isolated seed 9: reaches only itself, closeness NULL
    r(1).getLong(1) shouldBe 1L
    r(1).getLong(2) shouldBe 0L
    r(1).isNullAt(3) shouldBe true
    // horizon 1 truncates the reach
    val h = Graph.closenessCentrality(e, "s", "d", Seq(1L), maxHops = 1)
      .head()
    h.getLong(1) shouldBe 2L
    h.getLong(2) shouldBe 1L
  }

  test("wlRefine: path endpoints stay color-twins, center separates") {
    import spark.implicits._
    // path 1-2-3: degrees 1,2,1
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val wl = Graph.wlRefine(e, "s", "d", rounds = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2)).toMap
    wl((0, 1L)) shouldBe "1"
    wl((0, 2L)) shouldBe "2"
    wl((1, 1L)) shouldBe wl((1, 3L)) // isomorphic neighborhoods
    wl((1, 1L)) should not be wl((1, 2L))
    wl.keys.count(_._1 == 1) shouldBe 3
  }

  test("resourceAllocation: square's diagonals score 1/2 + 1/2") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val got = Graph.resourceAllocation(e, "s", "d",
      maxCenterDegree = 10, minCn = 2).orderBy("a", "b").collect()
    got.length shouldBe 2
    got.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 3L), (2L, 4L))
    all(got.map(_.getLong(2))) shouldBe 2L
    all(got.map(_.getDouble(3))) shouldBe 1.0
  }

  test("closeWedges: broadcast and shuffled-hash arms agree (r12)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    // K4 plus a tail: wedges at every apex, some closing, some not
    val canon = Graph.canonicalEdges(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (4L, 5L)).toDF("s", "d"), "s", "d")
    val left = canon.select(col("u").as("apex"), col("v").as("a"))
    val right = canon.select(col("u").as("apex"), col("v").as("b"))
    val wedges = left.join(right, Seq("apex"))
      .filter(col("a") < col("b"))
    val closing = canon.select(col("u").as("a"), col("v").as("b"))
    def rows(edgeCount: Long): Seq[(Long, Long, Long)] =
      Graph.closeWedges(wedges, closing, edgeCount)
        .orderBy("apex", "a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bcast = rows(edgeCount = Long.MaxValue min 4000000L) // broadcast arm
    val shuffle = rows(edgeCount = 4000001L)                 // fallback arm
    bcast shouldBe shuffle
    bcast.nonEmpty shouldBe true
    // the SEMI-join strategy actually differs per arm (the inner apex
    // join may broadcast at this fixture size either way)
    def semiLine(edgeCount: Long): String =
      Graph.closeWedges(wedges, closing, edgeCount)
        .queryExecution.executedPlan.toString
        .split('\n').filter(_.contains("LeftSemi")).mkString
    semiLine(1L) should include ("BroadcastHashJoin")
    semiLine(Long.MaxValue) should include ("ShuffledHashJoin")
  }
}
