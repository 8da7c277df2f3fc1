package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, FuzzyJoin, Graph, Quantiles, Similarity}

/** Scaling-curve smoke: runs the ex-weak operators (minhash-LSH dedup,
  * IVF ANN) on 1x/3x/10x blowups of the sf0.1 tables (id-offset copies,
  * so duplicate density RISES with scale — the adversarial direction for
  * LSH) and prints wall time + output size per scale. A measured curve,
  * not an extrapolation argument. Usage:
  *   runMain graft.tools.ScaleSmoke [sfDir] [maxFactor]
  */
object ScaleSmoke {
  /** Synthetic near-dup pair set scaled by `f` (chains of 3). */
  private def pairsDfScale(spark: SparkSession, dir: String,
      f: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    (0 until f).map { i =>
      spark.range(40000).select(
        (col("id") + lit(i * 10000000L)).as("id1"),
        (col("id") + lit(i * 10000000L + 40000L)).as("id2"))
    }.reduce(_ unionAll _).repartition(32)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Bench's per-query isolation, per STANZA here: release caches and
    // persistent/checkpoint blocks an operator left behind so no
    // stanza's retained heap (or disk spill) skews a later measurement
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    def blowup(base: DataFrame, idCol: String, factor: Int): DataFrame =
      (0 until factor).map { i =>
        base.withColumn(idCol, col(idCol) + lit(i * 10000000L))
      }.reduce(_ unionAll _)
        // model a multi-split corpus (single test file = one partition)
        .repartition(32)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))

    for (f <- Seq(1, 3, maxFactor).distinct.filter(_ <= maxFactor)) {
      val corpus = blowup(docs, "doc_id", f)
      val n = corpus.count()
      // minhashNearDups returns an eagerly-checkpointed frame, so the
      // timed call covers the whole pipeline and the count is free
      val (pairsDf, tMinhash) = time {
        Dedup.minhashNearDups(corpus, "doc_id", "text",
          shingleSize = 4, k = 16, bands = 4, threshold = 0.5,
          maxBucketSize = 10000)
      }
      val pairs = pairsDf.count()
      println(f"minhash  ${f}%2dx docs=$n%8d pairs=$pairs%9d  $tMinhash%7.1f s")

      // cluster assembly, both algorithms over the SAME materialized
      // pair set: pointer jumping (full edge list per round) vs
      // large-star/small-star (edge list contracts per round)
      val (cJump, tJump) = time {
        Dedup.connectedComponents(pairsDf).count()
      }
      println(f"cc-jump  ${f}%2dx nodes=$cJump%8d              $tJump%7.1f s")
      val (cStar, tStar) = time {
        Dedup.connectedComponentsContracting(pairsDf).count()
      }
      println(f"cc-star  ${f}%2dx nodes=$cStar%8d              $tStar%7.1f s")
      sweep() // pairsDf's checkpoint blocks are done — first safe point

      // exact-substring span removal: every copy makes every span a
      // >=2-doc duplicate, so the flag set and coverage joins grow with
      // the blowup — the worst case for the rewrite half
      val (cleaned, tSpan) = time {
        Dedup.removeDuplicatedSpans(corpus, "doc_id", "text",
          windowTokens = 20, minDocs = 2)
          .agg(sum(col("n_removed"))).head().getLong(0)
      }
      println(f"spanrm   ${f}%2dx docs=$n%8d cut=$cleaned%10d  $tSpan%7.1f s")
      sweep()

      // LM scoring: the MODEL stays vocab-bounded under the blowup
      // (same text repeated), only the scoring pass grows
      val (scored, tLm) = time {
        graft.operators.LanguageModel.scoreDocs(corpus, "doc_id", "text")
          .count()
      }
      println(f"lmscore  ${f}%2dx docs=$n%8d scored=$scored%7d  $tLm%7.1f s")
      sweep()

      val vecs = blowup(emb, "vec_id", f)
      val nv = vecs.count()
      val centroids = vecs.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("centroid_id"), col("e").as("centroid"))
      val queries = vecs.filter(col("vec_id") % 50 === 0)
      val (topk, tIvf) = time {
        Similarity.ivfTopK(queries, vecs, "vec_id", "e", 3, centroids).count()
      }
      println(f"ivf      ${f}%2dx vecs=$nv%8d topk=$topk%10d  $tIvf%7.1f s")

      // SemDeDup: blowup ids preserve mod-25, so the centroid count
      // grows with f and cluster size stays ~constant — pair work grows
      // linearly even though every vector now has f-1 exact copies
      val (semDups, tSem) = time {
        Dedup.semDeDup(vecs, "vec_id", "e", centroids, tau = 0.99).count()
      }
      println(f"semdedup ${f}%2dx vecs=$nv%8d dups=$semDups%9d  $tSem%7.1f s")
      sweep()

      // fuzzy join: names REGENERATED from the blown-up ids (an id-offset
      // copy would duplicate every name exactly — quadratic dist-0
      // buckets, not a scaling test), so neighbor density stays constant
      // and candidate keys scale linearly
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"))
      val names = blowup(cust, "c_custkey", f).select(col("c_custkey"),
        format_string("Customer#%09d", col("c_custkey")).as("name"))
      val nNames = names.count()
      val (fz, tFz) = time {
        FuzzyJoin.selfJoin(names, "c_custkey", "name", maxDist = 1).count()
      }
      println(f"fuzzy    ${f}%2dx names=$nNames%7d pairs=$fz%10d  $tFz%7.1f s")
      sweep()

      // triangles: id-offset copies are DISJOINT graph copies — wedge
      // work scales linearly with f at constant degree
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_orderkey") % 20000).as("src"),
          (col("l_partkey") * 7 % 20000).as("dst"))
      val edges = (0 until f).map { i =>
        li0.select((col("src") + lit(i * 10000000L)).as("src"),
          (col("dst") + lit(i * 10000000L)).as("dst"))
      }.reduce(_ unionAll _).repartition(32)
      val (triRow, tTri) = time {
        Graph.triangleCount(edges, "src", "dst").head()
      }
      println(f"triangle ${f}%2dx edges=${triRow.getLong(1)}%8d " +
        f"tris=${triRow.getLong(2)}%9d  $tTri%7.1f s")
      sweep()

      // BFS: the same disjoint graph copies, each with its own anchor
      // set (offsets are multiples of 1000, so anchors replicate per
      // copy) — frontier work scales linearly at constant diameter
      val (bfsRows, tBfs) = time {
        val sources = edges.select(col("src").as("node"))
          .unionAll(edges.select(col("dst").as("node")))
          .filter(col("node") % 1000 === 0).distinct()
        Graph.bfsDistances(edges, "src", "dst", sources, maxHops = 6)
          .count()
      }
      println(f"bfs      ${f}%2dx edges=${triRow.getLong(1)}%8d " +
        f"reach=$bfsRows%9d  $tBfs%7.1f s")
      sweep()

      // PageRank: the same disjoint copies — per-round work (rank join
      // + in-sum) scales linearly with edges at a FIXED round count,
      // the iterative-op scaling shape that matters
      val (prRows, tPr) = time {
        graft.operators.Graph.pageRank(edges, "src", "dst", iterations = 3)
          .count()
      }
      println(f"pagerank ${f}%2dx edges=${triRow.getLong(1)}%8d " +
        f"nodes=$prRows%9d  $tPr%7.1f s")
      sweep()

      // exact set-similarity join: copies share one vocabulary AND one
      // text set, so every dup group grows f× and the TRUE pair count
      // grows ~f² — the adversarial direction (same as the minhash
      // stanza). The claim under test: wall time tracks candidate/output
      // size, never docs² (prefix buckets grow f×, not corpus×corpus)
      val (ssPairs, tSs) = time {
        graft.operators.SetSimJoin.jaccardSelfJoin(
          corpus.filter(col("doc_id") % 4 === 0), "doc_id",
          graft.functions.TextAnalysis.tokens(lower(col("text"))),
          tau = 0.6).count()
      }
      println(f"setsim   ${f}%2dx docs=${n / 4}%8d pairs=$ssPairs%9d  $tSs%7.1f s")
      sweep()

      // interval join: copies shift DATES by 5000-day strides (id-offset
      // alone would overlap every window with every copy — f² output,
      // not a scaling test), so windows and intervals stay equally
      // dense and output scales linearly
      val li1 = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord1 = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") % 50 === 0)
      val epochL = lit("1970-01-01")
      val liIv = (0 until f).map { i =>
        li1.select(col("l_quantity"),
          (datediff(to_date(col("l_shipdate")), epochL) + lit(i * 5000))
            .cast("long").as("l_start"),
          (datediff(to_date(col("l_shipdate")), epochL) + lit(i * 5000) +
            (col("l_linenumber") % 7) + 1).cast("long").as("l_end"))
      }.reduce(_ unionAll _).repartition(32)
      val ordIv = (0 until f).map { i =>
        ord1.select((col("o_orderkey") + lit(i * 10000000L)).as("o_orderkey"),
          (datediff(to_date(col("o_orderdate")), epochL) + lit(i * 5000))
            .cast("long").as("w_start"))
      }.reduce(_ unionAll _).withColumn("w_end", col("w_start") + 14)
      val nWindows = ordIv.count()
      val (ivPairs, tIv) = time {
        graft.operators.IntervalJoin.overlapJoin(
          liIv, "l_start", "l_end", ordIv, "w_start", "w_end", 16L).count()
      }
      println(f"interval ${f}%2dx windows=$nWindows%7d pairs=$ivPairs%10d  $tIv%7.1f s")
      sweep()

      // exact percentiles: copies leave the DISTINCT value set constant
      // — the post-aggregation range shuffle must not grow with f
      val prices = (0 until f).map(_ =>
          spark.read.parquet(s"$dir/lineitem.parquet")
            .select(col("l_extendedprice")))
        .reduce(_ unionAll _).repartition(32)
      val (pq, tPq) = time {
        Quantiles.exactPercentiles(prices, "l_extendedprice",
          Seq(0.5, 0.99)).count()
      }
      println(f"pctile   ${f}%2dx qrows=$pq%8d              $tPq%7.1f s")
      sweep()

      // source-overlap: copies multiply the gram stream linearly but
      // the group count is CONSTANT, so pair-join fan-out per gram
      // stays ≤ (#sources choose 2) and the output row count must not
      // grow — wall should track the gram stream (linear), never docs²
      val corpusSrc = (0 until f).map { i =>
          spark.read.parquet(s"$dir/documents.parquet")
            .select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
              col("source"), col("text"))
        }.reduce(_ unionAll _).repartition(32)
      val (ovRows, tOv) = time {
        graft.operators.CorpusOverlap
          .sourceOverlap(corpusSrc, "source", "text", n = 3).count()
      }
      println(f"overlap  ${f}%2dx docs=$n%8d pairs=$ovRows%9d  $tOv%7.1f s")
      sweep()

      // DSIR importance scoring: same cost class as lmscore (two count
      // aggregates + one bigram-keyed join + per-doc fold) — wall must
      // scale with the bigram stream, the model tables stay
      // vocab-bounded under copies
      val corpusLang = (0 until f).map { i =>
          spark.read.parquet(s"$dir/documents.parquet")
            .select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
              col("lang"), col("text"))
        }.reduce(_ unionAll _).repartition(32)
      val (dsirRows, tDsir) = time {
        graft.operators.ImportanceScoring.dsirScores(
          corpusLang, "doc_id", "text", col("lang") === "en").count()
      }
      println(f"dsir     ${f}%2dx docs=$n%8d scored=$dsirRows%7d  $tDsir%7.1f s")
      sweep()

      // as-of nearest: copies multiply events; the operator is ONE
      // shuffle (window partitionBy) + per-key linear window scan, so
      // wall must track event count — no pair explosion however many
      // purchases precede a view
      val evScale = (0 until f).map { i =>
          spark.read.parquet(s"$dir/events.parquet")
            .select((col("user_id") + lit(i * 10000000L)).as("user_id"),
              col("event_id"), col("event_type"),
              // raw parquet carries TIMESTAMP_NTZ (Tables.load is what
              // normalizes it in the engine paths) — cast for the hash
              unix_micros(col("ts").cast("timestamp")).as("tm"),
              col("value"))
        }.reduce(_ unionAll _).repartition(32)
      // winnowing: one codegen'd map-only pass — wall must be linear
      // in total text, fingerprint count linear (density 2/(w+1))
      val (wfp, tWf) = time {
        corpus.select(col("doc_id"),
          graft.functions.TextAnalysis
            .winnowingFingerprints(col("text"), 5, 4).as("fp"))
          .agg(sum(size(col("fp")))).head().getLong(0)
      }
      println(f"winnow   ${f}%2dx docs=$n%8d fps=$wfp%9d  $tWf%7.1f s")
      sweep()

      // k-core: per-round cost is one degree aggregate + two
      // shrinking semi-joins; copies scale edges linearly and leave
      // the degree distribution intact, so rounds stay constant and
      // wall tracks edge count
      val edgesK = (0 until f).map { i =>
          spark.read.parquet(s"$dir/lineitem.parquet")
            .filter(col("l_orderkey") % 5 === 0)
            .select((col("l_suppkey") + lit(i * 10000000L)).as("s"),
              (col("l_partkey") % 300 + 10000 + i * 10000000L).as("p"))
        }.reduce(_ unionAll _).repartition(32)
      val (coreN, tK) = time {
        Graph.kCore(edgesK, "s", "p", k = 35).count()
      }
      println(f"kcore    ${f}%2dx edges~${599063L * f / 5}%8d core=$coreN%7d  $tK%7.1f s")
      sweep()

      val nEv = evScale.count()
      val (asofRows, tAsof) = time {
        graft.operators.AsOfJoin.asOf(
          evScale.filter(col("event_type") === "view")
            .select(col("event_id"), col("user_id"), col("tm")),
          evScale.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("tm").as("rm"), col("value")),
          Seq("user_id"), "tm", "rm", Seq("value"),
          direction = "nearest").count()
      }
      println(f"asofnear ${f}%2dx events=$nEv%8d out=$asofRows%9d  $tAsof%7.1f s")
      sweep()

      // round-6 operators ------------------------------------------------
      // mergeInto: full-outer key join + CASE — wall must track the
      // larger side; source is a fixed-rate mutation feed
      val baseCust = (0 until f).map { i =>
          spark.read.parquet(s"$dir/customer.parquet")
            .select((col("c_custkey") + lit(i * 10000000L)).as("c_custkey"),
              col("c_name"), col("c_nationkey"), col("c_acctbal"),
              col("c_mktsegment"))
        }.reduce(_ unionAll _).repartition(32)
      val srcCust = baseCust.filter(col("c_custkey") % 5 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1.0)
      val (mRows, tM) = time {
        graft.operators.UpdateJob.mergeInto(baseCust, srcCust,
          Seq("c_custkey"),
          whenMatchedUpdate = Some(lit(true)),
          whenNotMatchedBySourceDelete =
            Some(col("c_custkey") % 100 === 7),
          checkDuplicateSource = false).count()
      }
      println(f"mergeinto ${f}%2dx base=${baseCust.count()}%8d out=$mRows%8d  $tM%6.1f s")
      sweep()

      // ewma: one grouping shuffle + per-key fold — wall tracks events
      val (ewRows, tEw) = time {
        graft.operators.TimeSeries.ewma(
          evScale.select(col("user_id"), col("tm").as("ts"), col("value"))
            .filter(col("value").isNotNull),
          Seq("user_id"), Seq(col("ts")), col("value"), 0.25).count()
      }
      println(f"ewma     ${f}%2dx events=$nEv%8d keys=$ewRows%8d  $tEw%6.1f s")
      sweep()

      // incremental CC: star summary + new pairs — wall must track the
      // DELTA (new pairs), not the old pair set, so the old side is the
      // FULL pair set and the delta stays constant across factors
      val ccPairs = pairsDfScale(spark, dir, f)
      val oldAssign = graft.operators.Dedup.connectedComponents(ccPairs)
      val newEdges = spark.range(2000).select(
        (col("id") * 3).as("id1"), (col("id") * 3 + 900000000L).as("id2"))
      val (mcRows, tMc) = time {
        graft.operators.Dedup.mergeClusters(oldAssign, newEdges).count()
      }
      println(f"mergecc  ${f}%2dx oldpairs=${ccPairs.count()}%8d merged=$mcRows%8d  $tMc%6.1f s")
      sweep()

      // line dedup WITH the adversarial universal footer: every doc
      // carries the same boilerplate line, so the winner aggregate's
      // hottest key has multiplicity = |docs|. Partial aggregation
      // must collapse it map-side — wall tracks docs linearly, never
      // the hot key's multiplicity
      val lined = corpus.select(col("doc_id"),
        concat(lit("universal footer line\n"),
          regexp_replace(col("text"), " (\\w+ \\w+ \\w+ \\w+ \\w+)",
            "\n$1")).as("text"))
      val (ldRows, tLd) = time {
        Dedup.dedupLines(lined, "doc_id", "text")
          .agg(sum(col("n_kept"))).head().getLong(0)
      }
      println(f"linededup ${f}%2dx docs=$n%8d kept=$ldRows%9d  $tLd%6.1f s")
      sweep()

      // skyline: frontier of (price, recency) — distinct-x collapse +
      // prefix-max; frontier output is tiny at every factor
      val ordersF = blowup(spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("doc_id"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("x"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("y")),
        "doc_id", f)
      val (skyN, tSky) = time {
        graft.operators.Skyline.frontier2D(ordersF, "x", "y").count()
      }
      println(f"skyline  ${f}%2dx rows=${ordersF.count()}%8d frontier=$skyN%5d  $tSky%6.1f s")
      sweep()

      // round-6 continuation operators ----------------------------------
      val evCents = evScale.select(col("user_id"), col("tm"),
        col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))

      // isotonic PAVA: user-offset copies multiply groups at constant
      // per-group size — wall must track rows (groups parallel, stack
      // state bounded by distinct x per group)
      val (isoRows, tIso) = time {
        graft.operators.Isotonic.fitByGroup(
          evCents.withColumn("y",
            when(col("event_type") === "purchase", 100L).otherwise(0L)),
          "user_id", "cents", "y").count()
      }
      println(f"isotonic ${f}%2dx events=$nEv%8d cells=$isoRows%8d  $tIso%6.1f s")
      sweep()

      // ROC-AUC: copies repeat the same 2-dp values, so the DISTINCT
      // score table is ~constant — after the first aggregate the
      // two-pass prefix works on a fixed-size table; wall must track
      // the input scan only
      val (aucRow, tAuc) = time {
        graft.operators.Evaluation.rocAuc(
          evCents.withColumn("pos", col("event_type") === "purchase"),
          col("pos"), col("cents")).head()
      }
      println(f"rocauc   ${f}%2dx events=$nEv%8d u2=${aucRow.getLong(2)}%14d  $tAuc%6.1f s")
      sweep()

      // CUSUM (window closed form): one user-partitioned window — no
      // per-key collect, wall linear in events at any history length
      val (cuRows, tCu) = time {
        graft.operators.TimeSeries.cusum(evCents, Seq("user_id"),
          Seq(col("tm"), col("event_id")), col("cents"),
          k = 7000L, h = 30000L).count()
      }
      println(f"cusum    ${f}%2dx events=$nEv%8d keys=$cuRows%8d  $tCu%6.1f s")
      sweep()

      // RAKE: two explodes + three hash aggregates — wall linear in
      // token stream; the word table is vocab-bounded under copies
      val (rakeRows, tRake) = time {
        graft.operators.Retrieval.rakeKeywords(
          corpus.select(col("doc_id"), lower(col("text")).as("t")),
          "doc_id", "t", Seq("a", "the")).count()
      }
      println(f"rake     ${f}%2dx docs=$n%8d words=$rakeRows%8d  $tRake%6.1f s")
      sweep()

      // market basket: order-offset copies multiply baskets at
      // constant basket size — pair work Σ C(k_b,2) linear in baskets
      val liBask = (0 until f).map { i =>
          spark.read.parquet(s"$dir/lineitem.parquet")
            .select((col("l_orderkey") + lit(i * 10000000L)).as("bk"),
              (col("l_partkey") % 1000).as("it"))
        }.reduce(_ unionAll _).repartition(32)
      val (blRows, tBl) = time {
        graft.operators.MarketBasket.pairLift(liBask, "bk", "it").count()
      }
      println(f"basket   ${f}%2dx rows=${liBask.count()}%8d pairs=$blRows%8d  $tBl%6.1f s")
      sweep()

      // neighborhood jaccard: disjoint graph copies — wedge work and
      // edge scoring both linear at constant degree distribution
      val (njRows, tNj) = time {
        graft.operators.Graph.neighborhoodJaccard(edges, "src", "dst",
          maxCenterDegree = 50).count()
      }
      println(f"njaccard ${f}%2dx edges=${triRow.getLong(1)}%8d scored=$njRows%8d  $tNj%6.1f s")
      sweep()

      // spearman: copies multiply rows per group; two rank windows
      // per group — wall tracks the two sort-shuffles, linear
      val (spRows, tSp) = time {
        graft.operators.Evaluation.spearmanByGroup(
          evCents.withColumn("y", col("user_id")),
          "event_type", col("cents"), col("y")).count()
      }
      println(f"spearman ${f}%2dx events=$nEv%8d groups=$spRows%8d  $tSp%6.1f s")
      sweep()

      // assortativity: disjoint graph copies — degree table and stub
      // moments linear; one aggregate row regardless of scale
      val (asR, tAs) = time {
        Graph.degreeAssortativity(edges, "src", "dst").head()
      }
      println(f"assort   ${f}%2dx stubs=${asR.getLong(0)}%8d  $tAs%6.1f s")
      sweep()

      // kaplan-meier: user-offset copies multiply subjects at a FIXED
      // step count (31 days) — per-group fold is O(k²)=O(31²) however
      // large the cohort; wall must track the counting aggregate only
      val (kmRows, tKm) = time {
        graft.operators.Evaluation.kaplanMeier(
          evScale.select(col("event_type").as("g"),
            dayofmonth(timestamp_micros(col("tm"))).cast("long")
              .as("dur"),
            (col("event_id") % 4 =!= 0).as("ev")),
          "g", col("dur"), col("ev")).count()
      }
      println(f"km       ${f}%2dx events=$nEv%8d steps=$kmRows%8d  $tKm%6.1f s")
      sweep()

      // changepoint: per-type daily series stays 31 points under
      // copies — the aggregate dominates, split search is constant
      val (cpRows, tCp) = time {
        graft.operators.TimeSeries.changepoint(
          evCents.select(col("event_type").as("g"),
            to_date(timestamp_micros(col("tm"))).as("day"),
            col("cents"))
            .groupBy(col("g"), col("day"))
            .agg(sum(col("cents")).as("tot")),
          Seq("g"), col("day"), col("tot")).count()
      }
      println(f"chgpoint ${f}%2dx events=$nEv%8d splits=$cpRows%8d  $tCp%6.1f s")
      sweep()

      // cooccurrence: doc copies multiply token stream linearly; the
      // pair space is vocab²-bounded so the final aggregate is flat —
      // wall must track the lead() windows over tokens
      val (coRows, tCo) = time {
        graft.operators.Vocab.cooccurrence(corpus, "doc_id", "text",
          win = 2, topK = 100).count()
      }
      println(f"coocc    ${f}%2dx docs=$n%8d top=$coRows%8d  $tCo%6.1f s")
      sweep()

      // inverted index: token stream linear; postings stay capped and
      // term table vocab-bounded — the two aggregates dominate
      val (iiRows, tIi) = time {
        graft.operators.Retrieval.invertedIndex(corpus, "doc_id",
          "text", minDf = 50L, postingsCap = 5).count()
      }
      println(f"invindex ${f}%2dx docs=$n%8d terms=$iiRows%8d  $tIi%6.1f s")
      sweep()

      // chunking: pure per-row explode — wall linear in corpus bytes,
      // zero shuffles (count() collapses map-side)
      val (chRows, tCh) = time {
        graft.operators.Retrieval.chunkFixedStride(corpus, "doc_id",
          "text", size = 512, step = 400).count()
      }
      println(f"chunks   ${f}%2dx docs=$n%8d chunks=$chRows%8d  $tCh%6.1f s")
      sweep()

      // containment join: doc copies multiply rare-shingle postings
      // linearly (4-gram df stays bounded under id-offset copies) —
      // candidate pairs and verify work must track corpus size
      val (cpairs, tCont) = time {
        graft.operators.SetSimJoin.containmentSelfJoin(corpus,
          "doc_id",
          graft.functions.TextAnalysis.wordNgrams(col("text"), 4),
          0.8).count()
      }
      println(f"contain  ${f}%2dx docs=$n%8d pairs=$cpairs%8d  $tCont%6.1f s")
      sweep()

      // token bucket: per-user integer fold — one grouping shuffle,
      // wall linear in events at constant per-user history
      val (tbRows, tTb) = time {
        graft.operators.EventAnalytics.tokenBucket(
          evScale.select(col("user_id"), col("event_id"),
            timestamp_micros(col("tm")).as("ts")),
          "user_id", "ts", "event_id", 3L, 1L, 1L).count()
      }
      println(f"tokenbkt ${f}%2dx events=$nEv%8d users=$tbRows%8d  $tTb%6.1f s")
      sweep()

      // chi2 features: presence distinct + vocab×class aggregates —
      // token stream linear, everything downstream vocab-bounded
      val (chiRows, tChi) = time {
        graft.operators.Vocab.chi2FeatureSelection(corpusLang,
          "doc_id", "text", "lang", topK = 10).count()
      }
      println(f"chi2feat ${f}%2dx docs=$n%8d rows=$chiRows%8d  $tChi%6.1f s")
      sweep()
    }

    // ---------------- adversarial-skew stanzas (power-law fixtures) ----
    // The uniform-copy curves above scale everything evenly; real 100 TB
    // corpora are power-law. These stanzas plant the skew that breaks
    // naive implementations — a token in EVERY document (frequency 2e4 ≥
    // the 1e4 bar) and a 1e4-degree hub vertex — and record the bounded
    // quantities the designs claim: prefix-bucket fan-in for setsim, the
    // per-round aggregate row count for LPA.

    // setsim: 20k docs, each 12 tokens from a 40k vocab (mean tf ~6)
    // plus the universal token "hot" (tf 20000). An unfiltered
    // token-bucket join would put 20000² pair work in hot's bucket; the
    // ascending-frequency prefix order must keep "hot" out of every
    // prefix, so the real fan-in is set by the RARE tokens.
    {
      val docsSkew = spark.range(20000).select(col("id").as("doc_id"),
        array((0 until 12).map(j =>
          concat(lit("t"), ((col("id") * 7 + lit(j * 13)) % 40000)
            .cast("string"))) :+ lit("hot"): _*).as("toks"))
      val sets = graft.operators.SetSimJoin
        .tokenSets(docsSkew, "doc_id", col("toks"))
      val probes = graft.operators.SetSimJoin.prefixProbes(sets, 0.6)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val hotInPrefix = probes.filter(col("__tok") === "hot").count()
      val buckets = probes.groupBy(col("__tok")).agg(count(lit(1)).as("c"))
      val mb = buckets.agg(max(col("c")).as("m"),
        sum(col("c") * (col("c") - 1) / 2).as("candBound")).head()
      probes.unpersist()
      val (pairsSkew, tSkew) = time {
        graft.operators.SetSimJoin.jaccardSelfJoin(
          docsSkew, "doc_id", col("toks"), tau = 0.6).count()
      }
      println(f"setskew  docs=20000 hotTf=20000 hotInPrefix=$hotInPrefix " +
        f"maxBucket=${mb.getLong(0)} candBound=${mb.getAs[Number](1).longValue}%d " +
        f"pairs=$pairsSkew  $tSkew%6.1f s")
      sweep()
    }

    // LPA: background graph of 20k nodes at ~3 edges/node, then the
    // same graph plus a 1e4-degree hub. The per-round (neighbor, label)
    // aggregate processes one row per directed edge — so adding the hub
    // must add ~1e4 aggregate rows (its own degree), not square
    // anything; wall should move by the edge-count delta, not explode.
    {
      val bg = spark.range(60000).select(
        ((col("id") * 31) % 20000).as("src"),
        ((col("id") * 17 + 5) % 20000).as("dst"))
        .filter(col("src") =!= col("dst"))
      val hub = spark.range(10000).select(lit(20001L).as("src"),
        (col("id") * 2 + 1).as("dst"))
      for ((name, g) <- Seq("lpa-bg  " -> bg, "lpa-hub " -> bg.unionAll(hub))) {
        val m = g.count()
        val (lbl, tLpa) = time {
          Graph.labelPropagation(g, "src", "dst", iterations = 4).count()
        }
        println(f"$name edges=$m%7d aggRowsPerRound=${2 * m}%8d " +
          f"nodes=$lbl%7d  $tLpa%6.1f s")
        sweep()
      }
    }
    spark.stop()
  }
}
