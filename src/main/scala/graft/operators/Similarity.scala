package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star extension):
  * brute-force cosine top-k as the exact baseline, and random-hyperplane
  * LSH bucketing as the approximate scale path.
  *
  * Scale design (100 TB):
  *  - brute force is O(|queries| x |corpus|): fine when the query set is
  *    small (broadcast the queries, stream the corpus — one map-side pass).
  *    The top-k itself is a bounded-heap aggregation (CollectTopK, k items
  *    per query per partition map-side), so the only shuffle carries
  *    |queries| x partitions x k rows — never the full scored cross
  *    product, which a row_number window would sort-shuffle in full.
  *  - LSH: bucket signature is map-only; the join is keyed by bucket, so
  *    each query only meets its bucket's candidates. More planes = smaller
  *    buckets = faster + less recall; multi-probe (flip one bit) would
  *    widen recall without rebucketing.
  *
  * Hyperplane coefficients are derived from md5 driver-side and embedded
  * as literals, so the DuckDB oracle can use the exact same planes.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane coefficients in [-1, 1):
    * plane p, dim d -> md5("p:d") first 8 hex as uint32, scaled.
    * Computed once on the driver; same formula is reproducible in any
    * engine with md5. */
  def planeCoefficients(planes: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val hex = md.synchronized {
        md.reset()
        md.digest(s"$p:$d".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
      }
      java.lang.Long.parseLong(hex, 16) / 2147483648.0 - 1.0
    }
  }

  /** Johnson–Lindenstrauss random projection to `outDims` dimensions:
    * y_j = (1/√outDims) · Σ_d R[j][d] · x[d], with R the deterministic
    * md5-derived coefficient matrix ([[planeCoefficients]]) — the
    * standard dense-Gaussian-free JL variant (Achlioptas 2001 shows
    * bounded iid coefficients preserve the distance guarantees).
    * Reduces ANN/clustering cost ~dims/outDims at a controlled
    * distortion (ε ~ √(ln n / outDims)). Map-only; the per-dim dot
    * product folds IN ORDER (zip_with + left fold from 0.0), so the
    * projected doubles are bit-reproducible under any partitioning
    * and replayable in the DuckDB oracle. */
  def randomProject(emb: Column, inDims: Int, outDims: Int): Column = {
    require(outDims >= 1 && inDims >= 1, "dims must be positive")
    val coefs = planeCoefficients(outDims, inDims)
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    val comps = (0 until outDims).map { j =>
      val row = array(coefs(j).map(lit).toIndexedSeq: _*)
      aggregate(
        zip_with(row, emb, (c, x) => c * x.cast("double")),
        lit(0.0), (acc, t) => acc + t) * lit(scale)
    }
    array(comps: _*)
  }

  /** Matryoshka truncation (Kusupati et al. 2022): keep the first `k`
    * coordinates and L2-renormalize — the "shorten the embedding,
    * keep the geometry" trick MRL-trained models support. In-order
    * norm fold, same bit-reproducibility contract as
    * [[randomProject]]. Zero-norm prefixes return the unnormalized
    * truncation (all zeros) rather than NaNs. */
  def matryoshka(emb: Column, k: Int): Column = {
    require(k >= 1, s"k ($k) must be >= 1")
    val pre = slice(emb, 1, k)
    val norm = sqrt(aggregate(pre,
      lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(norm > 0.0, transform(pre, x => x.cast("double") / norm))
      .otherwise(transform(pre, x => x.cast("double")))
  }

  /** Cosine similarity with deterministic in-order summation. */
  def cosine(a: Column, b: Column): Column = Dedup.cosine(a, b)

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.ByteType => true
      case _: org.apache.spark.sql.types.ShortType => true
      case _: org.apache.spark.sql.types.IntegerType => true
      case _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Rank the k best (cos desc, neighbor_id asc) neighbors per query_id
    * from a scored (query_id, neighbor_id, cos) frame.
    *
    * Uses Spark's bounded-heap CollectTopK aggregate instead of a
    * row_number window: the partial (map-side) buffer never holds more
    * than k items per query, so the exchange carries
    * |queries| x partitions x k rows — the window form would shuffle and
    * sort EVERY scored row. eval() returns the heap sorted by the
    * requested ordering, so posexplode's position is the rank.
    *
    * The heap's id-asc tie-break rides in the ordering struct as the
    * NEGATED id, which is only order-correct for integral ids (and
    * Long.MinValue is the one unrepresentable edge). Non-integral id
    * types fall back to the window form, which orders any orderable
    * type — correctness over speed for the exotic case. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    if (!isIntegral(scored.schema("neighbor_id").dataType)) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
    } else {
      // ordering struct: cos desc, then neighbor_id asc via negation;
      // the raw neighbor_id rides along in the last slot.
      val item = struct(col("cos"), (-col("neighbor_id")).as("__neg"),
        col("neighbor_id"))
      // reverse=false: keep the k LARGEST items, eval() sorted
      // descending (pinned by SimilaritySpec) — posexplode pos 0 = rank 1
      val topk = ColumnBridge.collectTopK(item, k, reverse = false)
      scored.groupBy(col("query_id")).agg(topk.as("__topk"))
        .select(col("query_id"), posexplode(col("__topk")))
        .select(col("query_id"), (col("pos") + 1).as("rank"),
          col("col.neighbor_id").as("neighbor_id"), col("col.cos").as("cos"))
    }
  }

  /** LSH bucket key: sign bits of the embedding against each plane,
    * rendered "b0b1b2...". `embCol` must be array<double>. */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { coeffs =>
      val dot = aggregate(
        zip_with(emb, lit(coeffs), (x, c) => x * c), lit(0.0), _ + _)
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits.toIndexedSeq: _*)
  }

  /** Exact brute-force top-k: every query row against every corpus row.
    * `queries`/`corpus` need (idCol, embCol array<double>). Output:
    * (query_id, rank, neighbor_id, cos). The query side is broadcast —
    * the corpus is scanned once with no shuffle before the final top-k. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(embCol).as("__qe")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("__qe"), col("__ce")))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    * every vector to its nearest centroid; a query only scores vectors
    * in its own centroid's list. `centroids` is any small DataFrame of
    * (centroid_id, centroid embedding) — at real scale produced by
    * k-means; callers wanting deterministic/oracle-checkable behavior
    * pass a fixed subset of the corpus.
    *
    * Scale: assignment is a map-only argmax against the (driver-
    * collected, literal) centroid set — no exchange at all until the
    * probe join, which shuffles once keyed by centroid. `nprobe` > 1
    * widens recall by probing the query's next-nearest centroids too
    * (corpus vectors still live in exactly one inverted list, so no
    * duplicate candidate pairs arise). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int,
      centroids: DataFrame, nprobe: Int = 1): DataFrame = {
    val qa =
      if (nprobe <= 1) assignToCentroids(queries, idCol, embCol, centroids,
        "query_id")
      else assignTopNCentroids(queries, idCol, embCol, centroids,
        "query_id", nprobe)
    val ca = assignToCentroids(corpus, idCol, embCol, centroids, "neighbor_id")
      .withColumnRenamed("__v", "__cvv")
    val scored = qa.join(ca, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("__v"), col("__cvv")))
    rankTopK(scored, k)
  }

  /** Nearest-centroid assignment (the IVF coarse quantizer): the
    * centroid set is k small rows by contract, so collect it once and
    * embed it as ONE literal matrix behind the codegen'd
    * CentroidArgmaxExpression — assignment is a MAP-ONLY argmax
    * (cos desc, centroid_id asc; cosine arithmetic is VectorUtil's, so
    * choices are bit-identical to composing k cosine expressions).
    * Zero exchange per assignment — which compounds ×iterations inside
    * `trainCentroids` — and one expression node regardless of k, so no
    * k-wide tree for the optimizer to fold per query. (The original
    * broadcast-join + row-id `max_by` form shuffled every row WITH its
    * embedding for an argmax whose partial aggregation reduced
    * nothing: row-id groups are unique.) Output: (outId, __v embedding,
    * centroid_id long — ids are cast driver-side so the matrix is
    * uniformly typed).
    *
    * PRECONDITION: `idCol` is unique per row. The map-only form emits
    * one assignment per INPUT ROW; duplicate ids would duplicate their
    * rows downstream (the old groupBy form collapsed them, but
    * arbitrarily — via first(__v) — and at the cost of the row-id
    * exchange this rework removed). */
  def assignToCentroids(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, outId: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => CB, expression => E}
    require(isIntegral(centroids.schema("centroid_id").dataType),
      "centroid_id must be an integral type")
    val cents = centroids
      .select(col("centroid_id").cast("long"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    require(cents.nonEmpty, "centroids must be non-empty")
    val ids = typedLit[Seq[Long]](cents.map(_._1).toSeq)
    val mat = typedLit[Seq[Seq[Double]]](cents.map(_._2).toSeq)
    df.select(col(idCol).as(outId), col(embCol).as("__v"))
      .withColumn("centroid_id",
        CB(graft.expressions.CentroidArgmaxExpression(
          E(col("__v")), E(ids), E(mat))))
  }

  /** Multi-probe assignment: each row gets its `n` nearest centroids
    * (cosine desc, centroid_id asc), one output row per probe. Same
    * bounded-heap shape as rankTopK — the partial buffer holds n
    * centroid ids per row, never the scored expansion. */
  def assignTopNCentroids(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, outId: String, n: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    require(isIntegral(centroids.schema("centroid_id").dataType),
      "centroid_id must be an integral type")
    val c = broadcast(centroids.select(col("centroid_id"),
      col("centroid").as("__cv")))
    val item = struct(col("__cscore"), (-col("centroid_id")).as("__neg"),
      col("centroid_id"))
    df.select(col(idCol).as(outId), col(embCol).as("__v"))
      .join(c)
      .withColumn("__cscore", cosine(col("__v"), col("__cv")))
      .groupBy(col(outId))
      .agg(first(col("__v")).as("__v"),
        ColumnBridge.collectTopK(item, n, reverse = false).as("__cands"))
      .select(col(outId), col("__v"),
        explode(col("__cands")).as("__cand"))
      .select(col(outId), col("__v"),
        col("__cand.centroid_id").as("centroid_id"))
  }

  /** Lloyd's k-means over cosine assignment — the trainer that produces
    * IVF centroids at scale (round-1 callers supplied fixed corpus
    * subsets; this closes that gap). Deterministic initialization:
    * the k lowest-id vectors. Each iteration is one map-only
    * assignment (see assignToCentroids) plus one mean-update — the
    * update explodes (centroid_id, dim) pairs and averages per cell, a
    * skew-free shuffle of k×dims groups regardless of corpus size.
    *
    * Not oracle-checked: floating-point reduction order in the mean
    * makes centroids bit-nondeterministic across partitionings (cluster
    * MEMBERSHIP on separated data is stable — SimilaritySpec pins
    * that). */
  def trainCentroids(corpus: DataFrame, idCol: String, embCol: String,
      k: Int, iterations: Int = 5): DataFrame = {
    require(k > 0 && iterations >= 0)
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).as("__tid"),
      transform(col(embCol), x => x.cast("double")).as("__te"))
      .persist()
    // init: the k lowest-id vectors via orderBy+limit (a distributed
    // TakeOrderedAndProject — k rows to the driver, never a full sort)
    val init = vecs.orderBy(col("__tid")).limit(k)
      .select(col("__te")).as[Seq[Double]].collect()
    var cents = init.zipWithIndex
      .map { case (e, i) => (i.toLong, e) }.toSeq
      .toDF("centroid_id", "centroid")
    for (_ <- 0 until iterations) {
      val assigned = assignToCentroids(vecs, "__tid", "__te", cents, "__aid")
      cents = assigned
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("x")).as("x"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("x")))),
          s => s.getField("x")).as("centroid"))
      cents = cents.localCheckpoint(eager = true) // cut the lineage per round
    }
    vecs.unpersist()
    cents
  }

  /** Approximate top-k: candidates limited to the query's LSH bucket.
    * Same output shape as bruteForceTopK (rank within bucket).
    *
    * `multiProbe = true` additionally probes every Hamming-1 neighbor
    * bucket (each sign bit flipped once): a near neighbor that landed
    * just across one hyperplane is recovered without rebucketing the
    * corpus. Probe fan-out is 1 + planes rows per QUERY only — the
    * corpus side still lives in exactly one bucket, so no duplicate
    * candidate pairs arise and the join stays bucket-keyed. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int,
      planes: Array[Array[Double]],
      multiProbe: Boolean = false): DataFrame = {
    val nPlanes = planes.length
    val q0 = queries.select(col(idCol).as("query_id"), col(embCol).as("__qe"),
      lshBucket(col(embCol), planes).as("__qb"))
    val q =
      if (!multiProbe) q0
      else {
        val flipped = (0 until nPlanes).map { i =>
          concat(substring(col("__qb"), 1, i),
            when(substring(col("__qb"), i + 1, 1) === "1", lit("0"))
              .otherwise(lit("1")),
            substring(col("__qb"), i + 2, nPlanes - i - 1))
        }
        q0.select(col("query_id"), col("__qe"),
          explode(array(col("__qb") +: flipped: _*)).as("__qb"))
      }
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"),
      lshBucket(col(embCol), planes).as("__cb"))
    val scored = q.join(c, col("__qb") === col("__cb") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("__qe"), col("__ce")))
    rankTopK(scored, k)
  }

  // ---------------------------------------------------- int8 quantization

  /** Int8 quantization of an embedding (max-abs scaling): struct(scale,
    * q) where q_i = floor(127·x_i/scale + 0.5) in [-127, 127]. The
    * storage/transport compression step for corpus-scale embedding
    * tables — 4× smaller than float32, dequantized error bounded by
    * scale/254 per element. Map-only; no shuffle at any scale.
    *
    * Portability: elements are cast to double BEFORE the max/divide so
    * both engines run identical IEEE double ops, and rounding is the
    * explicit `floor(x + 0.5)` (half-up) rather than `round()`, whose
    * half-way rule differs across engines. An all-zero vector gets
    * scale 0 and all-zero codes. */
  // ----------------------------------------------- product quantization

  /** Squared L2 over two same-length double arrays (left-associated
    * fold, mirrored by the oracle's expansion). */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Collect a (subspace, centroid_id, codeword) codebook frame to
    * driver-side literal matrices, subspaces ascending, codewords in
    * centroid_id order. Codebooks are m×k×(d/m) doubles by contract —
    * driver-bounded (e.g. 8×256×8 = 16k values), the same contract as
    * assignToCentroids' centroid collect. */
  private def collectCodebooks(
      codebooks: DataFrame): Array[(Int, Array[Seq[Double]])] =
    codebooks
      .select(col("subspace").cast("int"), col("centroid_id").cast("long"),
        col("codeword"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (s, ws) => (s, ws.sortBy(_._2).map(_._3)) }

  /** Train PQ codebooks (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", PAMI 2011): split the d-dim space into
    * `m` contiguous subspaces and run the k-means trainer
    * independently in each — the classic compressed-vector index build.
    * Output: (subspace, centroid_id, codeword) with centroid_id dense
    * 0..k-1 per subspace. FP caveats of [[trainCentroids]] apply
    * (means are reduction-order sensitive → spec-checked, not
    * oracle-checked; encode/score with FIXED codebooks is fully
    * deterministic and IS oracle-checked in q114). */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, embCol: String,
      m: Int, k: Int, dims: Int, iterations: Int = 5): DataFrame = {
    require(m > 0 && dims % m == 0, s"dims ($dims) must divide into m ($m)")
    val subDim = dims / m
    (0 until m).map { s =>
      val sliced = corpus.select(col(idCol),
        slice(col(embCol), s * subDim + 1, subDim).as("__sub"))
      trainCentroids(sliced, idCol, "__sub", k, iterations)
        .select(lit(s).as("subspace"), col("centroid_id"),
          col("centroid").as("codeword"))
    }.reduce(_ unionAll _)
  }

  /** Squared L2 from `embCol`'s subspace-`s` slice to each of the
    * subspace's codewords, as an array column (codebook rides as a
    * literal matrix — the assignToCentroids discipline). The shared
    * core of encode (argmin over it) and ADC (the LUT is one per
    * subspace). */
  private def subspaceDists(embCol: Column, s: Int,
      words: Array[Seq[Double]]): Column = {
    val subDim = words.head.length
    val sl = slice(embCol, s * subDim + 1, subDim)
    val mat = typedLit[Seq[Seq[Double]]](words.toSeq)
    transform(mat, cw => sqDist(sl, cw))
  }

  /** Per-query ADC lookup table: array of per-subspace distance
    * arrays. */
  private def adcLut(embCol: Column,
      cbs: Array[(Int, Array[Seq[Double]])]): Column =
    array(cbs.map { case (s, words) =>
      subspaceDists(embCol, s, words)
    }.toIndexedSeq: _*)

  /** ADC score: m LUT lookups summed (codes index the per-subspace
    * distance arrays). */
  private def adcScore(lutCol: Column, codesCol: Column): Column =
    aggregate(zip_with(lutCol, codesCol,
      (tbl, cd) => element_at(tbl, cd + 1)), lit(0.0), _ + _)

  /** k smallest (adist, neighbor_id) per query via the bounded heap
    * (reverse=true keeps the smallest, sorted ascending). */
  private def rankByDistance(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val item = struct(col("adist"), col("neighbor_id"))
    val topk = ColumnBridge.collectTopK(item, k, reverse = true)
    scored.groupBy(col("query_id")).agg(topk.as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.neighbor_id").as("neighbor_id"),
        col("col.adist").as("adist"))
  }

  /** PQ-encode every vector: per subspace, the 0-based index of the
    * nearest codeword by squared L2 (first index wins exact ties —
    * deterministic). Output: (idCol, codes array<int> of length m).
    * Storage per vector: m small ints instead of d doubles — 32× at
    * d=64, m=8 with byte-range codebooks; at 100 TB this is the
    * difference between an in-memory candidate scan and an I/O-bound
    * one. Encode is MAP-ONLY (codebooks ride as literals — the
    * assignToCentroids discipline), zero exchange. */
  def pqEncode(df: DataFrame, idCol: String, embCol: String,
      codebooks: DataFrame): DataFrame = {
    val cbs = collectCodebooks(codebooks)
    require(cbs.nonEmpty, "codebooks must be non-empty")
    val codeCols = cbs.map { case (s, words) =>
      val dists = subspaceDists(col(embCol), s, words)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    df.select(col(idCol), array(codeCols.toIndexedSeq: _*).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query keeps
    * its FULL vector and precomputes an m×k lookup table of squared
    * L2 distances to every codeword (map-only, literal codebooks);
    * scoring a corpus vector is then m table lookups summed — never a
    * d-dim arithmetic pass. Output: (query_id, rank, neighbor_id,
    * adist), k smallest approximate distances, ties by neighbor_id.
    *
    * Scale: the classic IVF-ADC split — the corpus side carries only
    * (id, m-byte code); queries broadcast with their LUTs; the only
    * aggregation is the bounded-heap top-k (k items per query per
    * partition). Compose with [[assignToCentroids]] bucketing for
    * IVF-PQ: probe-join on centroid_id first, then ADC-score within
    * the list. */
  def pqTopK(queries: DataFrame, codes: DataFrame, idCol: String,
      embCol: String, codebooks: DataFrame, k: Int): DataFrame = {
    val cbs = collectCodebooks(codebooks)
    require(cbs.nonEmpty, "codebooks must be non-empty")
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), adcLut(col(embCol), cbs).as("__lut")))
    val c = codes.select(col(idCol).as("neighbor_id"),
      col("codes").as("__codes"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcScore(col("__lut"), col("__codes")))
    rankByDistance(scored, k)
  }

  /** Full IVF-PQ (the FAISS-standard composition, executable rather
    * than a doc claim): corpus and queries are bucketed by the coarse
    * quantizer ([[assignToCentroids]] / multi-probe), and ADC scoring
    * runs WITHIN the probed inverted lists only — candidate work is
    * list-sized, not corpus-sized, and each candidate costs m table
    * lookups. `codes` must be pqEncode output for the same id space as
    * `corpus`.
    *
    * Scale: probe join shuffles once keyed by centroid_id; the corpus
    * side carries (id, centroid_id, m codes) — the compressed index a
    * 100 TB deployment actually stores; full vectors are needed only
    * on the (few) query rows. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, codes: DataFrame,
      idCol: String, embCol: String, centroids: DataFrame,
      codebooks: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val cbs = collectCodebooks(codebooks)
    require(cbs.nonEmpty, "codebooks must be non-empty")
    val qa =
      if (nprobe <= 1)
        assignToCentroids(queries, idCol, embCol, centroids, "query_id")
      else assignTopNCentroids(queries, idCol, embCol, centroids,
        "query_id", nprobe)
    val q = qa.withColumn("__lut", adcLut(col("__v"), cbs)).drop("__v")
    val ca = assignToCentroids(corpus, idCol, embCol, centroids,
        "neighbor_id")
      .select(col("neighbor_id"), col("centroid_id"))
      .join(codes.select(col(idCol).as("neighbor_id"),
        col("codes").as("__codes")), Seq("neighbor_id"))
    val scored = q.join(ca, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcScore(col("__lut"), col("__codes")))
    rankByDistance(scored, k)
  }

  /** Leave-one-out kNN classification eval: every vector is classified
    * by the majority label of its k nearest neighbors (self excluded)
    * and scored against its own label — the standard embedding-quality
    * probe for a labeled eval set. Similarity is the raw INTEGER dot
    * of the int8-quantized codes ([[quantizeInt8]]): exact, total, and
    * tie-broken by neighbor id, so ranking and votes are deterministic
    * on any engine or partitioning (float cosine ranking is not).
    * Majority ties break toward the smaller label.
    *
    * Scale contract: `df` is an EVAL SET (it is broadcast as the query
    * side; the corpus side streams map-only into the bounded-heap
    * top-k — the [[bruteForceTopK]] shape). Classifying a full corpus
    * belongs to [[ivfTopK]]/[[lshTopK]], not this harness.
    *
    * @return per true label: (label, n, n_correct, accuracy) */
  def knnLooEval(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val codes = df.select(col(idCol).cast("long").as("__id"),
      col(labelCol).cast("long").as("__lbl"),
      quantizeInt8(col(vecCol)).getField("q").as("__q"))
    val q = broadcast(codes.select(col("__id").as("query_id"),
      col("__q").as("__qq")))
    val c = codes.select(col("__id").as("neighbor_id"),
      col("__q").as("__nq"))
    // 64-dim int8 dots stay far under 2^53, so the double cast that
    // feeds the shared top-k heap is exact
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", aggregate(
        zip_with(col("__qq"), col("__nq"),
          (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), _ + _).cast("double"))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val top = rankTopK(scored, k)
      .join(codes.select(col("__id").as("neighbor_id"),
        col("__lbl").as("__nlbl")), Seq("neighbor_id"))
    val votes = top.groupBy(col("query_id"), col("__nlbl"))
      .agg(count(lit(1)).as("__v"))
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__v").desc, col("__nlbl"))
    val pred = votes.withColumn("__rn", row_number().over(wv))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("__nlbl").as("__pred"))
    pred.join(codes.select(col("__id").as("query_id"),
        col("__lbl")), Seq("query_id"))
      .groupBy(col("__lbl").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__pred") === col("__lbl"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        (col("n_correct").cast("double") / col("n").cast("double"))
          .as("accuracy"))
  }

  /** ANN quality eval: recall@k of the LSH-bucketed search against
    * the exact ranking, per query. Both rankings score the INTEGER
    * int8-code dot (deterministic order, engine-replayable — float
    * cosine ties are not), so the only difference between the two
    * arms is the bucket restriction: recall isolates the indexing
    * loss, not scoring noise. Queries broadcast (eval-set contract,
    * as [[knnLooEval]]); the exact arm streams the corpus into the
    * bounded top-k heap, the approx arm joins on bucket equality.
    * recall = |approx ∩ exact| / k (short buckets count against
    * recall, as they should).
    *
    * @return per query: (query_id, n_approx, n_hits, recall) */
  def annRecallEval(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, planes: Array[Array[Double]],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    def prep(df: DataFrame): DataFrame = {
      val e = transform(col(vecCol), x => x.cast("double"))
      df.select(col(idCol).cast("long").as("__id"),
        quantizeInt8(col(vecCol)).getField("q").as("__q"),
        lshBucket(e, planes).as("__b"))
    }
    val q = broadcast(prep(queries).select(col("__id").as("query_id"),
      col("__q").as("__qq"), col("__b").as("__qb")))
    val c = prep(corpus).select(col("__id").as("neighbor_id"),
      col("__q").as("__nq"), col("__b").as("__nb"))
    def intDot: Column = aggregate(
      zip_with(col("__qq"), col("__nq"),
        (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), _ + _).cast("double")
    val exact = rankTopK(
      q.join(c, col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", intDot)
        .select(col("query_id"), col("neighbor_id"), col("cos")), k)
    val approx = rankTopK(
      q.join(c, col("query_id") =!= col("neighbor_id") &&
          col("__qb") === col("__nb"))
        .withColumn("cos", intDot)
        .select(col("query_id"), col("neighbor_id"), col("cos")), k)
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    val na = approx.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_approx"))
    exact.select(col("query_id")).distinct()
      .join(na, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          lit(k.toDouble)).as("recall"))
  }

  def quantizeInt8(vec: Column): Column = {
    val ed = transform(vec, x => x.cast("double"))
    val scale = array_max(transform(ed, x => abs(x)))
    val q = when(scale === lit(0.0), transform(ed, _ => lit(0)))
      .otherwise(transform(ed,
        x => floor(x * lit(127.0) / scale + lit(0.5)).cast("int")))
    struct(scale.as("scale"), q.as("q"))
  }

  /** Inverse of quantizeInt8 (up to the quantization error). */
  def dequantizeInt8(quant: Column): Column = {
    val scale = quant.getField("scale")
    transform(quant.getField("q"),
      x => x.cast("double") * scale / lit(127.0))
  }

  /** Reciprocal (mutual) nearest-neighbor pairing — the high-precision
    * match rule of image/embedding dedup and cross-lingual mining
    * (cf. the margin-based RNN criterion of CCMatrix-style pipelines):
    * keep a pair iff each side is the other's top match. Takes a
    * CANDIDATE table (src, dst, score) from any generator — exact
    * dots on a small set, LSH/IVF buckets at corpus scale — so the
    * operator itself never enumerates pairs. Per-src argmax via
    * max_by (score desc, dst asc — deterministic ties), one
    * self-join for reciprocity, canonical id1 < id2.
    * @return (id1, id2, score) — score of the id1→id2 direction */
  def mutualTopMatches(cands: DataFrame, srcCol: String, dstCol: String,
      scoreCol: String): DataFrame = {
    val top1 = cands.groupBy(col(srcCol).as("__s"))
      .agg(max_by(col(dstCol),
          struct(col(scoreCol), -col(dstCol))).as("__t"),
        max(struct(col(scoreCol), -col(dstCol))).as("__ord"))
      .select(col("__s"), col("__t"),
        col("__ord").getField(scoreCol).as("__score"))
    top1.as("a")
      .join(top1.as("b"),
        col("b.__s") === col("a.__t") && col("b.__t") === col("a.__s") &&
          col("a.__s") < col("b.__s"))
      .select(col("a.__s").as("id1"), col("a.__t").as("id2"),
        col("a.__score").as("score"))
  }

  /** Hard-negative mining for contrastive training (the in-batch /
    * ANCE-style negative selection step of embedding-model and
    * reranker data prep): for every anchor, the k most-similar
    * vectors carrying a DIFFERENT label — pairs close in embedding
    * space but semantically distinct, the negatives that actually
    * move a contrastive loss.
    *
    * Scoring is the EXACT int8-quantized integer dot (the q369
    * verdict rule: never flips on float order); candidates come from
    * `signBits`-way sign-bucket blocking on the quantized prefix
    * dims, with anchors optionally multi-probing every bucket within
    * `probeFlips` sign flips (each candidate lives in exactly ONE
    * home bucket, so probing never duplicates a pair). Ranking is
    * Spark's bounded-heap CollectTopK (dot desc, neighbor_id asc) —
    * the map-side buffer never holds more than k items per anchor.
    *
    * Scale: the bucket join shuffles on a 2^signBits-ary key — size
    * signBits so corpus/2^signBits fits an executor partition (AQE
    * skew-split covers imbalance), and raise probeFlips rather than
    * shrinking signBits when recall needs widening: within-bucket
    * work is quadratic in bucket size but linear in probe count.
    *
    * @return (query_id, label, rank, neighbor_id, neighbor_label,
    *         dot) — ≤ k rows per anchor (fewer when the probed
    *         buckets hold fewer different-label candidates) */
  def hardNegatives(df: DataFrame, idCol: String, embCol: String,
      labelCol: String, k: Int, signBits: Int = 8,
      probeFlips: Int = 0): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    require(k >= 1 && k <= 1000, s"k ($k) out of [1, 1000]")
    require(signBits >= 1 && signBits <= 16,
      s"signBits ($signBits) out of [1, 16]")
    require(probeFlips >= 0 && probeFlips <= 4,
      s"probeFlips ($probeFlips) out of [0, 4]")
    def prep(outId: String, outQv: String, outLbl: String) = df
      .select(col(idCol).as(outId),
        Similarity.quantizeInt8(col(embCol)).getField("q").as(outQv),
        col(labelCol).as(outLbl))
      .withColumn("__bkt", (0 until signBits).map(i =>
        when(element_at(col(outQv), i + 1) > 0, 1 << i).otherwise(0))
        .reduce((a, b) => a + b))
    val cands = prep("neighbor_id", "__cq", "neighbor_label")
    val a0 = prep("query_id", "__aq", "label")
    val masks = (0 until (1 << signBits))
      .filter(m => Integer.bitCount(m) <= probeFlips)
      .map(m => lit(m))
    val anchors =
      if (probeFlips == 0) a0
      else a0.withColumn("__m", explode(array(masks: _*)))
        .withColumn("__bkt", col("__bkt").bitwiseXOR(col("__m")))
        .drop("__m")
    // codegen'd exact integer dot: the verify kernel runs on every
    // surviving bucket pair (millions at corpus scale) — the
    // interpreted zip_with fold measured 13.5 s on the sf0.1 gate
    // row; the tight-loop expression is the CosineSimilarityExpression
    // trade with identical values (exact integer sum)
    val intDot = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.IntDotExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(col("__aq")),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(col("__cq"))))
    val scored = cands.join(anchors, Seq("__bkt"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("label") =!= col("neighbor_label"))
      .select(col("query_id"), col("label"), col("neighbor_id"),
        col("neighbor_label"), intDot.as("dot"))
    val item = struct(col("dot"), (-col("neighbor_id")).as("__neg"),
      col("neighbor_id"), col("neighbor_label"))
    scored.groupBy(col("query_id"), col("label"))
      .agg(ColumnBridge.collectTopK(item, k, reverse = false).as("__t"))
      .select(col("query_id"), col("label"), posexplode(col("__t")))
      .select(col("query_id"), col("label"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"),
        col("col.neighbor_label").as("neighbor_label"),
        col("col.dot").as("dot"))
  }
}
