package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.TextAnalysis

/** Keyword retrieval over a document corpus: BM25 ranking (Robertson &
  * Spärck Jones probabilistic relevance framework, the BM25 form of
  * Robertson et al., TREC-3 1994). The query side of the TF-IDF surface
  * (q45 weighs a document's own terms; this ranks documents AGAINST a
  * query set) — what a training-data pipeline runs for targeted corpus
  * probes ("find the documents about X") and eval-set curation.
  *
  * Scale design (100 TB corpus, a handful of queries):
  *   - The query-term table is broadcast and semi-joined against the
  *     token stream BEFORE the tf aggregate, so the only shuffle
  *     carries (doc, matched-term) rows — the corpus vocabulary never
  *     aggregates, and documents with no query term never leave the
  *     map side.
  *   - Document length and corpus stats (N, avgdl) are map-only + one
  *     two-long aggregate; avgdl derives from an exact integer sum, so
  *     it is bit-identical under any partitioning.
  *   - Per-(query, doc) scores fold a SORTED score list (the q60 rule:
  *     both engines add identical floats in identical order), and the
  *     top-k per query is a bounded-heap CollectTopK — never a window
  *     sort over the scored set.
  *
  * Determinism: idf is the log-free ratio variant
  * (N - df + 0.5) / (df + 0.5) — monotone in df like the classic
  * log idf, but pure IEEE arithmetic with no libm dependence (the q45
  * rule). All inputs to the float math are exact integers (tf, df, dl,
  * N) plus one exact-sum-derived double (avgdl).
  */
object Retrieval {

  /** BM25 top-k documents per query.
    *
    * @param docs       corpus with an id column and a text column
    * @param queryTerms (query_id, term) rows — one row per query term,
    *                   terms lowercase; small (broadcast side)
    * @param k          documents returned per query
    * @return (query_id, rank, <idCol>, score, n_terms) — rank 1 = best;
    *         ties break by id descending (mirrors q45's rule)
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val id = col(idCol)
    val withDl = docs
      .select(id.as("__id"), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__id"), size(col("__tk")).cast("long").as("dl"),
        col("__tk"))

    // Corpus stats: N over all docs, avgdl from the exact token-count
    // sum (long) so the double division is partitioning-invariant.
    val stats = withDl
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
      .select(col("n"),
        (col("sum_dl").cast("double") / col("n").cast("double")).as("avgdl"))

    val qt = queryTerms.select(col("query_id"), col("term"))
    val qTermSet = qt.select(col("term")).distinct()

    // Token stream pruned to query terms BEFORE aggregation: the semi
    // join is broadcast, so non-matching tokens die map-side. dl rides
    // the stream (one long per token row) and into the tf group key —
    // it is functionally dependent on the doc id, so groups are
    // unchanged and no corpus-sized length join is ever needed.
    val matchedTokens = withDl
      .select(col("__id"), col("dl"), explode(col("__tk")).as("__tok"))
      .select(col("__id"), col("dl"), lower(col("__tok")).as("term"))
      .join(broadcast(qTermSet), Seq("term"), "left_semi")
    val tf = matchedTokens.groupBy(col("__id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // df per query term over the whole corpus (tf is already scoped).
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qt), Seq("term"))
      .withColumn("s",
        ((col("n").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          ((col("tf") * (lit(k1) + lit(1.0))) /
            (col("tf") + lit(k1) *
              (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))))

    // Sorted fold (q60 rule) -> deterministic double sum per (query, doc).
    val perDoc = scored.groupBy(col("query_id"), col("__id"))
      .agg(
        aggregate(sort_array(collect_list(col("s"))), lit(0.0), _ + _)
          .as("score"),
        count(lit(1)).as("n_terms"))

    val item = struct(col("score"), col("__id"), col("n_terms"))
    perDoc.groupBy(col("query_id"))
      .agg(ColumnBridge.collectTopK(item, k, reverse = false).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.__id").as(idCol), col("col.score").as("score"),
        col("col.n_terms").as("n_terms"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998) at λ = 1/2 over INTEGER-quantized vectors: from each
    * query's candidate set, greedily pick k items maximizing
    * 2·MMR = rel(d) − max_{s∈selected} sim(d, s) — relevance first,
    * then "relevant but unlike what's already picked". The result
    * diversifies retrieval/eval sets (k near-identical top hits
    * collapse to one plus genuinely different follow-ups).
    *
    * Everything is exact BIGINT arithmetic (int8-code dot products),
    * so the greedy argmax (score desc, id asc) can never flip on
    * float noise — which is what makes a cross-engine oracle possible
    * for an iterative selection. Caller contract: `df` is an already
    * TOP-C-BOUNDED candidate set per query (the q83/q19 top-k shape);
    * each group is collected per task — O(C·d) memory, C ≈ dozens —
    * and greedy is O(k·C) dot products. Groups run in parallel;
    * nothing global. */
  def mmrDiversify(df: DataFrame, queryCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(queryCol).cast("long"),
        col(idCol).cast("long"), col(relCol).cast("long"),
        col(vecCol).cast("array<int>"))
      .as[(Long, Long, Long, Seq[Int])]
    val out = ds.groupByKey(_._1).flatMapGroups { (q, it) =>
      val cs = it.toVector
      def dot(a: Seq[Int], b: Seq[Int]): Long = {
        var s = 0L; var i = 0
        while (i < a.length && i < b.length) {
          s += a(i).toLong * b(i).toLong; i += 1
        }
        s
      }
      var remaining = cs
      var simMax = Map.empty[Long, Long]
      val picks = Vector.newBuilder[(Long, Int, Long, Long, Long)]
      var r = 1
      while (r <= k && remaining.nonEmpty) {
        val best = remaining.minBy { c =>
          (-(c._3 - simMax.getOrElse(c._2, 0L)), c._2)
        }
        val score2 = best._3 - simMax.getOrElse(best._2, 0L)
        picks += ((q, r, best._2, best._3, score2))
        remaining = remaining.filterNot(_._2 == best._2)
        remaining.foreach { c =>
          val s = dot(c._4, best._4)
          val prev = simMax.get(c._2)
          simMax += c._2 -> (if (prev.isEmpty) s else math.max(prev.get, s))
        }
        r += 1
      }
      picks.result().iterator
    }
    out.toDF(queryCol, "sel_rank", idCol, relCol, "score2")
  }

  /** RAKE keyword scoring (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"), corpus-wide: candidate
    * phrases are maximal stopword-free word runs between punctuation
    * boundaries; each occurrence of word w in a phrase of length L
    * adds 1 to freq(w) and L to deg(w) (degree counts co-occurring
    * words INCLUDING itself); score = deg/freq rewards words that
    * live in long phrases. All counts exact integers, score one
    * division.
    *
    * Implementation is fully relational — two posexplodes, one
    * (doc, fragment)-partitioned running-sum window for phrase ids,
    * one phrase-length aggregate joined back, one word aggregate.
    * No per-document fold, no collect: every stage is a bounded
    * shuffle, so 100 TB of text streams through map-side explodes
    * plus three hash aggregates. Fragments split on any char outside
    * [a-z0-9' ] of the LOWERCASED text; callers normalize further
    * upstream if needed.
    *
    * @return (word, freq, deg, score) for non-stopword words */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    require(stopwords.nonEmpty, "RAKE needs a stopword list")
    val frags = docs
      .select(col(idCol).as("__id"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9' ]+"))
          .as(Seq("fi", "frag")))
      .filter(col("frag") =!= "")
    val words = frags
      .select(col("__id"), col("fi"),
        posexplode(split(col("frag"), " +")).as(Seq("wi", "word")))
      .filter(col("word") =!= "")
      .withColumn("stop",
        when(col("word").isin(stopwords: _*), 1L).otherwise(0L))
    val w = Window.partitionBy(col("__id"), col("fi")).orderBy(col("wi"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keep = words.withColumn("pid", sum(col("stop")).over(w))
      .filter(col("stop") === 0L)
      .select(col("__id"), col("fi"), col("pid"), col("word"))
    val plen = keep.groupBy(col("__id"), col("fi"), col("pid"))
      .agg(count(lit(1)).as("plen"))
    keep.join(plen, Seq("__id", "fi", "pid"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("word"), col("freq"), col("deg"),
        (col("deg").cast("double") / col("freq").cast("double"))
          .as("score"))
  }

  /** Fixed-stride character chunking with overlap — the RAG/embedding
    * preprocessing step: windows of `size` chars every `step` chars
    * (overlap = size − step), the final partial window kept. Pure
    * per-row explode (sequence + substring, whole-stage codegen, no
    * shuffle); chunk count per doc = ⌈len/step⌉, so output scales
    * linearly with corpus bytes.
    * @return (id, chunk_idx, chunk_start 0-based, chunk_len, chunk) */
  def chunkFixedStride(docs: DataFrame, idCol: String, textCol: String,
      size: Int, step: Int): DataFrame = {
    require(size > 0 && step > 0 && step <= size,
      s"need 0 < step <= size (got size=$size step=$step)")
    docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__t"),
        explode(sequence(lit(0), length(col(textCol)) - 1,
          lit(step))).as("chunk_start"))
      .select(col(idCol),
        // chunk_start is a multiple of step, so double-divide is exact
        (col("chunk_start") / step).cast("long").as("chunk_idx"),
        col("chunk_start").cast("long"),
        expr(s"substring(__t, chunk_start + 1, $size)").as("chunk"))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        length(col("chunk")).cast("long").as("chunk_len"),
        col("chunk"))
  }

  /** Inverted-index build: per term, document frequency, total term
    * frequency, and the first `postingsCap` doc ids of the posting
    * list (sorted, comma-joined — a SCALAR column so results stay
    * hashable; real sinks would keep the array). df/tf are exact over
    * the full corpus from one per-(term,doc) aggregate; the postings
    * head is a per-term rank ≤ cap filter BEFORE any collect (the
    * TopKHeapRewrite shape — bounded heap state per term), so a
    * stop-word term with millions of docs never materializes its
    * posting list in an aggregation buffer. The per-(term,doc) table
    * is persisted across its two consumers. Terms below `minDf` are
    * dropped (the long tail that dominates term count but no query
    * touches).
    * @return (term, df, tf, postings_head) */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, postingsCap: Int): DataFrame = {
    val perDoc = docs.select(col(idCol).as("__id"),
        explode(graft.functions.TextAnalysis
          .alnumTokens(col(textCol))).as("term"))
      .groupBy(col("term"), col("__id"))
      .agg(count(lit(1)).as("__tf_d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val stats = perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("__tf_d")).as("tf"))
      .filter(col("df") >= minDf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("__id"))
    val head = perDoc
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= postingsCap)
      .groupBy(col("term"))
      .agg(concat_ws(",", transform(
        sort_array(collect_list(col("__id"))),
        x => x.cast("string"))).as("postings_head"))
    stats.join(head, Seq("term"))
      .select(col("term"), col("df"), col("tf"), col("postings_head"))
  }

  /** Per-group [[rrfFuse]]: fuse ranked lists INSIDE each group (the
    * multi-query shape a retrieval service actually runs). Inputs are
    * (groupCol, idCol, `rank`) frames; fusion and the bounded-heap
    * top-k happen per group key — one grouping shuffle over candidate
    * lists, never corpus-sized.
    * @return (groupCol, fused_rank, idCol, rrf, n_lists) — ties cut
    *   by id ascending */
  def rrfFuseGrouped(rankings: Seq[DataFrame], groupCol: String,
      idCol: String, k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    import org.apache.spark.sql.graftshim.ColumnBridge
    val tagged = rankings
      .map(_.select(col(groupCol).as("__g"), col(idCol).as("__id"),
        (lit(1.0) / (lit(c.toDouble) + col("rank").cast("double")))
          .as("__s")))
      .reduce(_ unionAll _)
    val fused = tagged.groupBy(col("__g"), col("__id"))
      .agg(aggregate(sort_array(collect_list(col("__s"))), lit(0.0),
          (acc, x) => acc + x).as("rrf"),
        count(lit(1)).as("n_lists"))
    val item = struct(col("rrf"), (-col("__id")).as("__negid"),
      col("__id"), col("n_lists"))
    fused.groupBy(col("__g"))
      .agg(ColumnBridge.collectTopK(item, k, reverse = false).as("__tk"))
      .select(col("__g"), posexplode(col("__tk")))
      .select(col("__g").as(groupCol),
        (col("pos") + 1).cast("long").as("fused_rank"),
        col("col.__id").as(idCol), col("col.rrf").as("rrf"),
        col("col.n_lists").as("n_lists"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * merge ranked lists from heterogeneous retrievers (lexical +
    * vector, typically) by score(d) = Σ_lists 1/(c + rank_list(d)),
    * summing only over lists containing d. Each input is (idCol,
    * `rank`) with rank 1 = best. The per-list contributions fold in
    * SORTED order (the q60 rule) so the double sum is association-
    * deterministic for any list count; the final top-k is a global
    * TakeOrderedAndProject (bounded heap, no full sort). Union +
    * one grouping shuffle over the CANDIDATE lists only — inputs are
    * already top-bounded per retriever, so this never touches corpus
    * scale.
    * @return (<idCol>, rrf, n_lists) — the fused top-k, best first;
    *   ties cut by id ascending */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
      c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings
      .map(_.select(col(idCol).as("__id"),
        (lit(1.0) / (lit(c.toDouble) + col("rank").cast("double")))
          .as("__s")))
      .reduce(_ unionAll _)
    tagged.groupBy(col("__id"))
      .agg(aggregate(sort_array(collect_list(col("__s"))), lit(0.0),
          (acc, x) => acc + x).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("__id"))
      .limit(k)
      .select(col("__id").as(idCol), col("rrf"), col("n_lists"))
  }
}
