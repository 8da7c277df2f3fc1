package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Similarity}

/** Similarity-search coverage (north-star extension): exact brute-force
  * cosine top-k and LSH-bucketed approximate top-k over the `embeddings`
  * table (64-dim float vectors). Query set: vec_id % 50 == 0. */
object QueriesSimilarity {

  private val Dims = 64
  private val Planes = 4
  private val TopK = 5
  private val AnnK = 3

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))

  // --------------------------------------------------------------- q19
  private def q19BruteForce(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val queries = all.filter(col("vec_id") % 50 === 0)
    Similarity.bruteForceTopK(queries, all, "vec_id", "e", TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q19Sql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id % 50 = 0)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.e, c.e) AS cos,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id) AS rank
       |  FROM q JOIN e c ON c.vec_id != q.vec_id)
       |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  // --------------------------------------------------------------- q20
  private def q20AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val planes = Similarity.planeCoefficients(Planes, Dims)
    val all = emb(s, dir)
    val queries = all.filter(col("vec_id") % 50 === 0)
    Similarity.lshTopK(queries, all, "vec_id", "e", AnnK, planes)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q20Sql = {
    val planes = Similarity.planeCoefficients(Planes, Dims)
    // dot(e, plane_p) expanded as a left-associated term chain so the
    // summation order matches Spark's in-order aggregate fold
    def dot(p: Int): String =
      (0 until Dims).map(d => s"e[${d + 1}] * (${"%.17g".format(planes(p)(d))})")
        .mkString(" + ")
    val bucket = (0 until Planes)
      .map(p => s"(CASE WHEN ${dot(p)} >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |b AS (SELECT vec_id, e, $bucket AS bucket FROM e),
       |q AS (SELECT * FROM b WHERE vec_id % 50 = 0)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.e, c.e) AS cos,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id) AS rank
       |  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.vec_id)
       |WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin
  }

  // --------------------------------------------------------------- q32
  /** IVF ANN: coarse quantizer = every 25th vector as a centroid
    * (deterministic "training" so the oracle reproduces it); queries
    * probe their nearest centroid's inverted list. */
  private def q32Ivf(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val centroids = all.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("centroid_id"), col("e").as("centroid"))
    val queries = all.filter(col("vec_id") % 50 === 0)
    Similarity.ivfTopK(queries, all, "vec_id", "e", AnnK, centroids)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q32Sql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |cent AS (
       |  SELECT vec_id AS centroid_id, e AS cv FROM e WHERE vec_id % 25 = 0),
       |assigned AS (
       |  SELECT vec_id, e, centroid_id FROM (
       |    SELECT v.vec_id, v.e, c.centroid_id,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY list_cosine_similarity(v.e, c.cv) DESC, c.centroid_id)
       |        AS crn
       |    FROM e v CROSS JOIN cent c)
       |  WHERE crn = 1),
       |q AS (SELECT * FROM assigned WHERE vec_id % 50 = 0)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.e, c.e) AS cos,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id) AS rank
       |  FROM q JOIN assigned c
       |    ON c.centroid_id = q.centroid_id AND c.vec_id != q.vec_id)
       |WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------- q114
  /** Product quantization ADC (Similarity.pqEncode/pqTopK): the FAISS
    * IVF-PQ building block — 64-dim vectors compressed to m=4 subspace
    * codes against a DETERMINISTIC codebook (every 31st vector's
    * slices, positional ids), queries score by asymmetric distance
    * (per-subspace LUT lookups, never a d-dim arithmetic pass).
    * Codebook training at real scale is trainPqCodebooks (per-subspace
    * k-means — FP-order nondeterministic, spec-checked); the fixed
    * sample here makes encode+ADC fully oracle-reproducible, the same
    * deterministic-"training" trick as q32's IVF row. */
  private def q114Pq(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val m = 4
    val subDim = Dims / m
    val sampled = all.filter(col("vec_id") % 31 === 0)
    val codebooks = (0 until m).map { sp =>
      sampled.select(lit(sp).as("subspace"), col("vec_id").as("centroid_id"),
        slice(col("e"), sp * subDim + 1, subDim).as("codeword"))
    }.reduce(_ unionAll _)
    val codes = Similarity.pqEncode(all, "vec_id", "e", codebooks)
    val queries = all.filter(col("vec_id") % 50 === 0)
    Similarity.pqTopK(queries, codes, "vec_id", "e", codebooks, TopK)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q114Sql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |sub AS (SELECT unnest([0, 1, 2, 3]) AS sp),
       |cw AS (
       |  SELECT sp,
       |    row_number() OVER (PARTITION BY sp ORDER BY vec_id) - 1 AS cid,
       |    e[sp * 16 + 1 : sp * 16 + 16] AS w
       |  FROM (SELECT vec_id, e FROM e WHERE vec_id % 31 = 0)
       |  CROSS JOIN sub),
       |codes AS (
       |  SELECT vec_id, sp, cid FROM (
       |    SELECT v.vec_id, c.sp, c.cid,
       |      row_number() OVER (PARTITION BY v.vec_id, c.sp
       |        ORDER BY list_aggregate(list_transform(range(1, 17),
       |          i -> (v.e[c.sp * 16 + i] - c.w[i])
       |             * (v.e[c.sp * 16 + i] - c.w[i])), 'sum'),
       |          c.cid) AS rn
       |    FROM e v CROSS JOIN cw c)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id, e FROM e WHERE vec_id % 50 = 0),
       |scored AS (
       |  -- squared distances fold IN ORDER (dims then subspaces),
       |  -- mirroring Spark's sqDist/adcScore exactly — the previous
       |  -- list_distance(..)**2 round-tripped through sqrt (1-ulp
       |  -- noise) and the 4-way sum order was nondeterministic
       |  SELECT query_id, neighbor_id,
       |    list_aggregate(list(d2 ORDER BY sp), 'sum') AS adist
       |  FROM (
       |    SELECT q.vec_id AS query_id, k.vec_id AS neighbor_id,
       |      k.sp AS sp,
       |      list_aggregate(list_transform(range(1, 17),
       |        i -> (q.e[k.sp * 16 + i] - w.w[i])
       |           * (q.e[k.sp * 16 + i] - w.w[i])), 'sum') AS d2
       |    FROM q
       |    JOIN codes k ON k.vec_id != q.vec_id
       |    JOIN cw w ON w.sp = k.sp AND w.cid = k.cid)
       |  GROUP BY 1, 2)
       |SELECT query_id, rank, neighbor_id, adist FROM (
       |  SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------- export

  // -------------------------------------------------------------- q193
  /** MMR diversification (Retrieval.mmrDiversify) over int8-quantized
    * embeddings: every 97th vector is a query; its top-12 candidates
    * by integer code dot-product get greedily re-ranked to 5 picks at
    * λ=1/2 (2·MMR = rel − max-sim-to-selected, all BIGINT — the
    * integer arithmetic is what lets an ITERATIVE selection
    * oracle-check bit-exactly). The oracle unrolls the five greedy
    * steps (the q174 recurrence-unroll pattern), each step one
    * window-argmax over the not-yet-picked candidates joined to the
    * max pairwise sim against the picks so far. */
  private def q193Mmr(s: SparkSession, dir: String): DataFrame = {
    val qt = emb(s, dir).select(col("vec_id"),
      Similarity.quantizeInt8(col("e")).getField("q").as("qv"))
    val qry = qt.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"))
    val rel = qt.filter(col("vec_id") % 97 =!= 0)
      .crossJoin(broadcast(qry))
      .select(col("qid"), col("vec_id").as("id"), col("qv"),
        aggregate(zip_with(col("qqv"), col("qv"),
          (x, y) => x.cast("long") * y), lit(0L), _ + _).as("rel"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rel").desc, col("id"))
    val top = rel.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 12).drop("rn")
    Retrieval.mmrDiversify(top, "qid", "id", "rel", "qv", k = 5)
      .orderBy(col("qid"), col("sel_rank"))
  }

  private val q193Sql: String = {
    val steps = (2 to 5).map { r =>
      s"""sel$r AS (
         |  SELECT qid, id, rel, score2, $r AS sel_rank FROM (
         |    SELECT c.qid, c.id, c.rel, c.rel - ms.m AS score2,
         |      row_number() OVER (PARTITION BY c.qid
         |        ORDER BY c.rel - ms.m DESC, c.id) AS rn
         |    FROM cands c
         |    JOIN (SELECT p.qid, p.a AS id, max(p.s) AS m
         |          FROM sims p
         |          JOIN selupto${r - 1} s
         |            ON s.qid = p.qid AND s.id = p.b
         |          GROUP BY 1, 2) ms
         |      ON ms.qid = c.qid AND ms.id = c.id
         |    LEFT JOIN selupto${r - 1} sp
         |      ON sp.qid = c.qid AND sp.id = c.id
         |    WHERE sp.id IS NULL) z WHERE rn = 1),
         |selupto$r AS (
         |  SELECT * FROM selupto${r - 1} UNION ALL SELECT * FROM sel$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |sc AS (
       |  SELECT vec_id, e,
       |    list_max(list_transform(e, x -> abs(x))) AS scale
       |  FROM e),
       |qt AS (
       |  SELECT vec_id,
       |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
       |    ELSE list_transform(e,
       |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END
       |      AS qv
       |  FROM sc),
       |qry AS (SELECT vec_id AS qid, qv FROM qt WHERE vec_id % 97 = 0),
       |cand0 AS (
       |  SELECT q.qid, c.vec_id AS id, c.qv,
       |    CAST(list_aggregate(list_transform(range(1, 65),
       |      i -> CAST(q.qv[i] AS BIGINT) * c.qv[i]), 'sum') AS BIGINT)
       |      AS rel
       |  FROM qry q JOIN qt c ON c.vec_id % 97 <> 0),
       |cands AS (
       |  SELECT qid, id, qv, rel FROM (
       |    SELECT qid, id, qv, rel, row_number() OVER (
       |      PARTITION BY qid ORDER BY rel DESC, id) AS rn
       |    FROM cand0) t WHERE rn <= 12),
       |sims AS (
       |  SELECT a.qid, a.id AS a, b.id AS b,
       |    CAST(list_aggregate(list_transform(range(1, 65),
       |      i -> CAST(a.qv[i] AS BIGINT) * b.qv[i]), 'sum') AS BIGINT)
       |      AS s
       |  FROM cands a JOIN cands b
       |    ON a.qid = b.qid AND a.id <> b.id),
       |sel1 AS (
       |  SELECT qid, id, rel, rel AS score2, 1 AS sel_rank FROM (
       |    SELECT qid, id, rel, row_number() OVER (PARTITION BY qid
       |      ORDER BY rel DESC, id) AS rn FROM cands) t WHERE rn = 1),
       |selupto1 AS (SELECT * FROM sel1),
       |$steps
       |SELECT qid, CAST(sel_rank AS INT) AS sel_rank, id, rel, score2
       |FROM selupto5 ORDER BY qid, sel_rank""".stripMargin
  }

  // --------------------------------------------------------------- q59
  /** Int8 embedding quantization: per-vector max-abs scale + code sum +
    * saturation count (array itself summarized to integers so the
    * driver hash stays engine-portable). Map-only compression pass. */
  private def q59Quantize(s: SparkSession, dir: String): DataFrame = {
    val q = Similarity.quantizeInt8(col("e"))
    emb(s, dir).select(col("vec_id"), q.as("__q"))
      .select(col("vec_id"),
        col("__q.scale").as("scale"),
        aggregate(col("__q.q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        size(filter(col("__q.q"),
          x => x === 127 || x === -127)).as("n_sat"))
      .orderBy(col("vec_id"))
  }

  private val q59Sql =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |sc AS (
      |  SELECT vec_id, e,
      |    list_max(list_transform(e, x -> abs(x))) AS scale
      |  FROM e),
      |qt AS (
      |  SELECT vec_id, scale,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END AS qv
      |  FROM sc)
      |SELECT vec_id, scale,
      |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
      |  len(list_filter(qv, x -> x = 127 OR x = -127)) AS n_sat
      |FROM qt ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------------- q95
  /** Higher-order array-function suite over the embedding column — the
    * §2C "array/lambda scalar library" row: aggregate() (sequential
    * left fold — mirrored by DuckDB's list_reduce over a prepended
    * init, so the float->double fold order is IDENTICAL and the norm
    * is bit-deterministic), filter(), transform(), array_max/array_sort
    * /slice. All map-only whole-stage-codegen projections — the lambda
    * functions never leave the scan stage. */
  private def q95ArrayOps(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") % 40 === 0)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double")))
          .as("norm"),
        size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"),
        array_max(transform(col("embedding"), x => abs(x))).as("max_abs"),
        element_at(array_sort(transform(col("embedding"), x => abs(x))),
          -1).cast("double").as("top1_abs"),
        element_at(array_sort(transform(col("embedding"), x => abs(x))),
          -3).cast("double").as("top3_abs"))
      .withColumn("max_abs", col("max_abs").cast("double"))
      .orderBy(col("vec_id"))

  private val q95Sql =
    """SELECT vec_id,
      |  CAST(len(embedding) AS INT) AS dim,
      |  sqrt(list_reduce(list_prepend(0.0::DOUBLE, embedding::DOUBLE[]),
      |    (acc, x) -> acc + x * x)) AS norm,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
      |  CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
      |    AS max_abs,
      |  CAST(list_sort(list_transform(embedding, x -> abs(x)))[-1] AS DOUBLE)
      |    AS top1_abs,
      |  CAST(list_sort(list_transform(embedding, x -> abs(x)))[-3] AS DOUBLE)
      |    AS top3_abs
      |FROM embeddings WHERE vec_id % 40 = 0
      |ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------------- q173
  /** Embedding dimensionality reduction: JL random projection
    * (64 -> 16, md5-derived coefficients, exact 1/4 scale) and
    * matryoshka truncate-and-renormalize (first 8 dims). Every output
    * double is an IN-ORDER fold over the same operands in both
    * engines (the q168 discipline), so the gate compare is bit-exact;
    * three projection components + the first renormalized coordinate
    * keep the oracle restatement finite. Map-only at any scale. */
  private def q173Project(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val proj = Similarity.randomProject(col("embedding"), 64, 16)
    val trunc = Similarity.matryoshka(col("embedding"), 8)
    e.select(col("vec_id"),
        proj.as("p"), trunc.as("m"))
      .select(col("vec_id"),
        element_at(col("p"), 1).as("p0"),
        element_at(col("p"), 8).as("p7"),
        element_at(col("p"), 16).as("p15"),
        element_at(col("m"), 1).as("m0"))
      .orderBy(col("vec_id"))
  }

  private val q173Sql = {
    // same md5 coefficient formula as Similarity.planeCoefficients:
    // coef(p, d) = uint32(md5("p:d")[0:8]) / 2^31 - 1, scale 1/sqrt(16)
    def comp(j: Int) =
      s"""list_aggregate(list_transform(range(1, len(x) + 1),
         |    i -> (('0x' || substr(md5('$j' || ':' ||
         |        CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT
         |      / 2147483648.0 - 1.0) * x[i]), 'sum') * 0.25""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
       |  FROM embeddings)
       |SELECT vec_id,
       |  ${comp(0)} AS p0,
       |  ${comp(7)} AS p7,
       |  ${comp(15)} AS p15,
       |  CASE WHEN sqrt(list_aggregate(list_transform(x[1:8],
       |      v -> v * v), 'sum')) > 0.0
       |    THEN x[1] / sqrt(list_aggregate(list_transform(x[1:8],
       |      v -> v * v), 'sum'))
       |    ELSE x[1] END AS m0
       |FROM e ORDER BY vec_id""".stripMargin
  }

  // -------------------------------------------------------------- q219
  /** Leave-one-out kNN label eval (Similarity.knnLooEval, k=5) over
    * the labeled embeddings: integer int8-code dots make ranking,
    * votes, and tie-breaks engine-exact; accuracy per true label is
    * one division. Eval-set contract — the query side broadcasts, the
    * corpus side streams into the bounded top-k heap. The fixture is
    * the vec_id%10 EVAL SUBSET: LOO is an O(|eval|²) harness by
    * definition (the scaladoc's contract), so the gate/bench row must
    * feed it an eval set, not the corpus — full-scale ANN cost lives
    * with q224/ScaleSmoke. */
  private def q219KnnEval(s: SparkSession, dir: String): DataFrame =
    Similarity.knnLooEval(
        Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", "label", k = 5)
      .orderBy(col("label"))

  private val q219Sql =
    """WITH ed AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings WHERE vec_id % 10 = 0),
      |sc AS (
      |  SELECT vec_id, label, e,
      |    list_max(list_transform(e, x -> abs(x))) AS s
      |  FROM ed),
      |codes AS (
      |  SELECT vec_id, label,
      |    CASE WHEN s = 0 THEN list_transform(e, x -> 0)
      |      ELSE list_transform(e,
      |        x -> CAST(floor(x * 127.0 / s + 0.5) AS INT)) END AS q
      |  FROM sc),
      |pairs AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    b.label AS nlbl,
      |    CAST(list_sum(list_transform(a.q,
      |      (x, i) -> CAST(x AS BIGINT) * b.q[i])) AS BIGINT) AS dot
      |  FROM codes a JOIN codes b ON a.vec_id <> b.vec_id),
      |top AS (
      |  SELECT query_id, nlbl,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY dot DESC, neighbor_id) AS rn
      |  FROM pairs),
      |votes AS (
      |  SELECT query_id, nlbl, count(*) AS v
      |  FROM top WHERE rn <= 5 GROUP BY 1, 2),
      |pred AS (
      |  SELECT query_id, nlbl AS pred
      |  FROM (SELECT query_id, nlbl,
      |          row_number() OVER (PARTITION BY query_id
      |            ORDER BY v DESC, nlbl) AS rn
      |        FROM votes)
      |  WHERE rn = 1)
      |SELECT CAST(c.label AS BIGINT) AS label, count(*) AS n,
      |  CAST(sum(CASE WHEN p.pred = c.label THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_correct,
      |  CAST(sum(CASE WHEN p.pred = c.label THEN 1 ELSE 0 END)
      |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
      |FROM pred p JOIN codes c ON c.vec_id = p.query_id
      |GROUP BY c.label ORDER BY label""".stripMargin

  // -------------------------------------------------------------- q224
  /** ANN recall@5 eval (Similarity.annRecallEval): LSH-bucketed arm
    * vs the exact arm, BOTH ranking by integer int8-code dots so the
    * only delta is the bucket restriction — the indexing loss
    * isolated from scoring noise. The oracle replays quantization,
    * the plane-sign buckets (left-associated double dot chains, the
    * q20 discipline), both rankings, and the intersection. */
  private def q224AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val planes = Similarity.planeCoefficients(Planes, Dims)
    val all = Tables.load(s, dir, "embeddings")
    val queries = all.filter(col("vec_id") % 50 === 0)
    Similarity.annRecallEval(queries, all, "vec_id", "embedding",
        planes, k = 5)
      .orderBy(col("query_id"))
  }

  private val q224Sql = {
    val planes = Similarity.planeCoefficients(Planes, Dims)
    def dot(p: Int): String =
      (0 until Dims).map(d => s"e[${d + 1}] * (${"%.17g".format(planes(p)(d))})")
        .mkString(" + ")
    val bucket = (0 until Planes)
      .map(p => s"(CASE WHEN ${dot(p)} >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    val idot = "list_sum(list_transform(a.q, (x, i) -> CAST(x AS BIGINT) * b.q[i]))"
    s"""WITH ed AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |sc AS (SELECT vec_id, e,
       |  list_max(list_transform(e, x -> abs(x))) AS s FROM ed),
       |codes AS (
       |  SELECT vec_id,
       |    CASE WHEN s = 0 THEN list_transform(e, x -> 0)
       |      ELSE list_transform(e,
       |        x -> CAST(floor(x * 127.0 / s + 0.5) AS INT)) END AS q,
       |    $bucket AS bucket
       |  FROM sc),
       |qs AS (SELECT * FROM codes WHERE vec_id % 50 = 0),
       |ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY $idot DESC, b.vec_id) AS rn
       |    FROM qs a JOIN codes b ON a.vec_id <> b.vec_id)
       |  WHERE rn <= 5),
       |ap AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY $idot DESC, b.vec_id) AS rn
       |    FROM qs a JOIN codes b
       |      ON a.vec_id <> b.vec_id AND a.bucket = b.bucket)
       |  WHERE rn <= 5),
       |na AS (SELECT query_id, count(*) AS n_approx FROM ap GROUP BY 1),
       |h AS (
       |  SELECT ex.query_id, count(*) AS n_hits
       |  FROM ex JOIN ap ON ap.query_id = ex.query_id
       |    AND ap.neighbor_id = ex.neighbor_id
       |  GROUP BY 1),
       |qq AS (SELECT DISTINCT query_id FROM ex)
       |SELECT qq.query_id, coalesce(na.n_approx, 0) AS n_approx,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall
       |FROM qq LEFT JOIN na USING (query_id)
       |  LEFT JOIN h USING (query_id)
       |ORDER BY query_id""".stripMargin
  }

  // -------------------------------------------------------------- q278
  /** Distributed Gram matrix (Pca.gramMatrixInt8) — the data-sized half
    * of uncentered PCA: X᙮X over int8-quantized embeddings, every
    * entry an exact partitioning-invariant BIGINT. The d²/2 per-row
    * pair fan-out is the irreducible FLOP count of a Gram product;
    * hash aggregation collapses it map-side so the only shuffle
    * carries ≤ d²/2 rows per task. The driver-side eigensolve half
    * (Pca.topEigen — contract-bounded d² collect, the spark.ml PCA
    * split) is pinned by SimilaritySpec on a known-axis fixture; no
    * cross-engine contract exists for iterated float math, so the gate
    * row is the exact matrix itself, as the i ≤ j triangle. */
  private def q278GramMatrix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pca
    Pca.gramMatrixInt8(
        emb(s, dir).filter(col("vec_id") < 400).select(col("e")), "e")
      .orderBy(col("i"), col("j"))
  }

  private val q278Sql =
    """WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings WHERE vec_id < 400),
      |sc AS (
      |  SELECT vec_id, e,
      |    list_max(list_transform(e, x -> abs(x))) AS scale
      |  FROM e),
      |qt AS (
      |  SELECT vec_id,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS BIGINT)) END AS qv
      |  FROM sc),
      |pairs AS (
      |  SELECT ii.i AS i, jj.j AS j
      |  FROM (SELECT unnest(generate_series(0, 63)) AS i) ii,
      |       (SELECT unnest(generate_series(0, 63)) AS j) jj
      |  WHERE jj.j >= ii.i)
      |SELECT p.i, p.j,
      |  CAST(sum(q.qv[p.i + 1] * q.qv[p.j + 1]) AS BIGINT) AS g
      |FROM qt q, pairs p
      |GROUP BY p.i, p.j ORDER BY i, j""".stripMargin

  // -------------------------------------------------------------- q305
  /** Reciprocal nearest-neighbor pairs (Similarity.mutualTopMatches) —
    * the high-precision dedup/mining match rule: a pair survives iff
    * each side is the other's argmax. Candidates here are exact int8
    * dots with the query side broadcast (the q19 brute-force shape;
    * at corpus scale the candidate table comes from LSH/IVF instead —
    * the operator is generator-agnostic). All-integer scores make the
    * argmax and the reciprocity join oracle-exact. */
  private def q305MutualNn(s: SparkSession, dir: String): DataFrame = {
    // sign-bit blocking: candidates pair only within the 16-way
    // bucket of the first four quantized dims' signs — per-bucket
    // all-pairs is (n/16)²·16, not n² (the r6 bench caught the
    // unblocked form at 43 s; at 100 TB the block key would be more
    // bits + an ANN candidate stage, same mutualTopMatches contract)
    val qt = Tables.load(s, dir, "embeddings").select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding")).getField("q").as("qv"))
      .withColumn("bkt", (0 until 4).map(i =>
        when(element_at(col("qv"), i + 1) > 0, 1 << i).otherwise(0))
        .reduce((a, b) => a + b))
      .localCheckpoint(true)
    val cands = qt
      .join(broadcast(qt.select(col("bkt"), col("vec_id").as("__bid"),
        col("qv").as("__bqv"))), Seq("bkt"))
      .filter(col("__bid") =!= col("vec_id"))
      .select(col("vec_id").as("src"), col("__bid").as("dst"),
        aggregate(zip_with(col("qv"), col("__bqv"),
          (x, y) => x.cast("long") * y), lit(0L),
          (acc, x) => acc + x).as("dot"))
    Similarity.mutualTopMatches(cands, "src", "dst", "dot")
      .orderBy(col("id1"))
  }

  private val q305Sql =
    """WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |sc AS (
      |  SELECT vec_id, e,
      |    list_max(list_transform(e, x -> abs(x))) AS scale
      |  FROM e),
      |qt AS (
      |  SELECT vec_id,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END
      |      AS qv
      |  FROM sc),
      |qb AS (
      |  SELECT vec_id, qv,
      |    (CASE WHEN qv[1] > 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN qv[2] > 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN qv[3] > 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN qv[4] > 0 THEN 8 ELSE 0 END) AS bkt
      |  FROM qt),
      |d AS (
      |  SELECT a.vec_id AS s, b.vec_id AS t,
      |    CAST(list_aggregate(list_transform(range(1, 65),
      |      i -> CAST(a.qv[i] AS BIGINT) * b.qv[i]), 'sum') AS BIGINT)
      |      AS dot
      |  FROM qb a JOIN qb b ON b.bkt = a.bkt
      |    AND b.vec_id != a.vec_id),
      |top1 AS (
      |  SELECT s, t, dot FROM (
      |    SELECT s, t, dot, row_number() OVER (PARTITION BY s
      |      ORDER BY dot DESC, t) AS rn FROM d) z WHERE rn = 1)
      |SELECT a.s AS id1, a.t AS id2, a.dot AS score
      |FROM top1 a JOIN top1 b ON b.s = a.t AND b.t = a.s
      |WHERE a.s < b.s ORDER BY id1""".stripMargin

  // -------------------------------------------------------------- q369
  /** Semantic eval-set decontamination
    * (Decontamination.semanticContaminatedDocs) — the embedding-level
    * complement of q56's 13-gram pass: eval vectors are perturbed
    * copies of every 17th embedding (the q18 +0.05 fixture; a
    * paraphrase-shaped leak no n-gram can catch), and a corpus vector
    * is flagged iff an eval vector's EXACT int8-quantized dot reaches
    * 100 000 (planted self-dots land ≈ 2×10⁵, random-pair maxima
    * ≈ 5×10⁴ — measured gap, and the verdict is integer, so it can
    * NEVER flip on float order). Blocking = the q305 16-way sign
    * bucket on both sides, eval side broadcast; the oracle restates
    * quantization, bucketing, and the dot bit for bit. */
  private def q369SemanticDecon(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val ed = transform(col("embedding"), x => x.cast("double"))
    val evalSet = emb.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("eval_id"),
        concat(array(element_at(ed, 1) + lit(0.05)),
          slice(ed, 2, 10000)).as("ev"))
    graft.operators.Decontamination.semanticContaminatedDocs(
        emb, "vec_id", "embedding", evalSet, "eval_id", "ev",
        minDot = 100000L)
      .orderBy(col("doc_id"))
  }

  private val q369Sql =
    """WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |ev AS (
      |  SELECT vec_id AS eval_id, list_concat([e[1] + 0.05], e[2:]) AS e
      |  FROM e WHERE vec_id % 17 = 0),
      |csc AS (SELECT vec_id, e,
      |  list_max(list_transform(e, x -> abs(x))) AS scale FROM e),
      |cq AS (
      |  SELECT vec_id,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END
      |      AS qv
      |  FROM csc),
      |cqb AS (
      |  SELECT vec_id, qv,
      |    (CASE WHEN qv[1] > 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN qv[2] > 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN qv[3] > 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN qv[4] > 0 THEN 8 ELSE 0 END) AS bkt
      |  FROM cq),
      |esc AS (SELECT eval_id, e,
      |  list_max(list_transform(e, x -> abs(x))) AS scale FROM ev),
      |eq AS (
      |  SELECT eval_id,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END
      |      AS qv
      |  FROM esc),
      |eqb AS (
      |  SELECT eval_id, qv,
      |    (CASE WHEN qv[1] > 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN qv[2] > 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN qv[3] > 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN qv[4] > 0 THEN 8 ELSE 0 END) AS bkt
      |  FROM eq),
      |d AS (
      |  SELECT c.vec_id AS doc_id, q.eval_id,
      |    CAST(list_aggregate(list_transform(range(1, 65),
      |      i -> CAST(c.qv[i] AS BIGINT) * q.qv[i]), 'sum') AS BIGINT)
      |      AS dot
      |  FROM cqb c JOIN eqb q ON q.bkt = c.bkt)
      |SELECT doc_id, count(*) AS n_hits,
      |  CAST(max(dot) AS BIGINT) AS max_dot, min(eval_id) AS min_eval_id
      |FROM d WHERE dot >= 100000
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q375
  /** Incremental semantic dedup (IncrementalSemanticDedup.acceptBatch)
    * — q369's sign-bucket blocking turned into a PERSISTENT index the
    * corpus grows through batch by batch: planted near-dups (every
    * 10th embedding, perturbed +0.05 on dim 1, ids +10000 — the q18
    * fixture) arrive interleaved across three batches (doc_id mod 3),
    * and each batch probes the quantized index of everything earlier
    * before merging itself in. The index is COMPACTED between batches
    * 1 and 2 (compactIndex rewrites every per-batch file set into the
    * partitioned layout), so the row also pins — under an oracle that
    * knows nothing about files — that compaction preserves the
    * tag-exclusion and flag semantics (the q397 discipline, ported).
    * The contract under test: the 3-batch
    * incremental run equals the ONE-SHOT batch computation exactly
    * (flag iff ∃ earlier-in-arrival-order bucket-mate with exact int8
    * dot ≥ 10⁵) — the oracle restates that batch form declaratively
    * (the q324 state-machine pattern), so any index drift (self-
    * masking, missed earlier batch, retry ghosts, survivors-only
    * chain bias) shifts the flag set and fails the row. Integer dot
    * verdicts: nothing can flip on float order. */
  private def q375IncrSemantic(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val ed = transform(col("embedding"), x => x.cast("double"))
    val base = emb.select(col("vec_id").cast("long").as("doc_id"),
      ed.as("e"))
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000).cast("long").as("doc_id"),
        concat(array(element_at(ed, 1) + lit(0.05)),
          slice(ed, 2, 10000)).as("e"))
    val corpus = base.unionAll(copies)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_sem_idx").toString
    try {
    (0 until 3).map { b =>
      if (b == 2) // flags must be invariant under the file rewrite
        graft.operators.IncrementalSemanticDedup.compactIndex(s, idx)
      val batch = corpus.filter(pmod(col("doc_id"), lit(3)) === b)
      graft.operators.IncrementalSemanticDedup.acceptBatch(
          batch, "doc_id", "e", idx, s"day$b", minDot = 100000L)
        .withColumn("batch", lit(b.toLong))
    }.reduce(_ unionAll _)
      .filter(col("flagged"))
      .select(col("doc_id"), col("batch"), col("n_earlier"),
        col("max_dot"), col("dup_of"))
      .orderBy(col("doc_id"))
    // acceptBatch's verdicts are localCheckpoint-materialized, so the
    // index tree is dead weight once the union is built (q419's
    // no-orphaned-/tmp-tree hygiene)
    } finally QueriesDedup.deleteRecursively(
      java.nio.file.Paths.get(idx))
  }

  private val q375Sql =
    """WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |corpus AS (
      |  SELECT vec_id AS doc_id, e FROM e
      |  UNION ALL
      |  SELECT vec_id + 10000, list_concat([e[1] + 0.05], e[2:])
      |  FROM e WHERE vec_id % 10 = 0),
      |sc AS (SELECT doc_id, e,
      |  list_max(list_transform(e, x -> abs(x))) AS scale FROM corpus),
      |q AS (
      |  SELECT doc_id, doc_id % 3 AS batch,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END
      |      AS qv
      |  FROM sc),
      |b AS (
      |  SELECT doc_id, batch, qv,
      |    (CASE WHEN qv[1] > 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN qv[2] > 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN qv[3] > 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN qv[4] > 0 THEN 8 ELSE 0 END) AS bkt
      |  FROM q),
      |hits AS (
      |  SELECT d.doc_id, d.batch, a.doc_id AS eid,
      |    CAST(list_aggregate(list_transform(range(1, 65),
      |      i -> CAST(a.qv[i] AS BIGINT) * d.qv[i]), 'sum') AS BIGINT)
      |      AS dot
      |  FROM b d JOIN b a ON a.bkt = d.bkt
      |    AND (a.batch < d.batch
      |      OR (a.batch = d.batch AND a.doc_id < d.doc_id)))
      |SELECT doc_id, CAST(batch AS BIGINT) AS batch,
      |  CAST(count(*) AS BIGINT) AS n_earlier,
      |  CAST(max(dot) AS BIGINT) AS max_dot, min(eid) AS dup_of
      |FROM hits WHERE dot >= 100000
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q376
  /** Multi-probe semantic decontamination (q369's recall dial,
    * probeFlips = 1): eval vectors are every 17th embedding with dim 1
    * NEGATED — a perturbation that flips the leading sign bit, so the
    * planted leaks land in a DIFFERENT sign bucket than their corpus
    * originals and q369's single-bucket probe would miss essentially
    * all of them (the exact dot stays ≈ 2×10⁵ − 2q₁² ≥ 10⁵: negating
    * one of 64 dims barely dents it). With the eval side replicated
    * into the 5 buckets within Hamming 1 (classic multi-probe LSH on
    * the BROADCAST side — corpus work unchanged per surviving bucket
    * mate), the flags come back. The oracle restates quantization,
    * the xor-mask expansion, and the exact integer dot bit for bit. */
  private def q376MultiProbeDecon(s: SparkSession, dir: String)
      : DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val ed = transform(col("embedding"), x => x.cast("double"))
    val evalSet = emb.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("eval_id"),
        concat(array(-element_at(ed, 1)), slice(ed, 2, 10000)).as("ev"))
    graft.operators.Decontamination.semanticContaminatedDocs(
        emb, "vec_id", "embedding", evalSet, "eval_id", "ev",
        minDot = 100000L, probeFlips = 1)
      .orderBy(col("doc_id"))
  }

  private val q376Sql =
    """WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |ev AS (
      |  SELECT vec_id AS eval_id, list_concat([-e[1]], e[2:]) AS e
      |  FROM e WHERE vec_id % 17 = 0),
      |csc AS (SELECT vec_id, e,
      |  list_max(list_transform(e, x -> abs(x))) AS scale FROM e),
      |cq AS (
      |  SELECT vec_id,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END
      |      AS qv
      |  FROM csc),
      |cqb AS (
      |  SELECT vec_id, qv,
      |    (CASE WHEN qv[1] > 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN qv[2] > 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN qv[3] > 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN qv[4] > 0 THEN 8 ELSE 0 END) AS bkt
      |  FROM cq),
      |esc AS (SELECT eval_id, e,
      |  list_max(list_transform(e, x -> abs(x))) AS scale FROM ev),
      |eq AS (
      |  SELECT eval_id,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END
      |      AS qv
      |  FROM esc),
      |eqb AS (
      |  SELECT eval_id, qv,
      |    xor((CASE WHEN qv[1] > 0 THEN 1 ELSE 0 END)
      |      + (CASE WHEN qv[2] > 0 THEN 2 ELSE 0 END)
      |      + (CASE WHEN qv[3] > 0 THEN 4 ELSE 0 END)
      |      + (CASE WHEN qv[4] > 0 THEN 8 ELSE 0 END), m.m) AS bkt
      |  FROM eq CROSS JOIN (VALUES (0), (1), (2), (4), (8)) AS m(m)),
      |d AS (
      |  SELECT c.vec_id AS doc_id, q.eval_id,
      |    CAST(list_aggregate(list_transform(range(1, 65),
      |      i -> CAST(c.qv[i] AS BIGINT) * q.qv[i]), 'sum') AS BIGINT)
      |      AS dot
      |  FROM cqb c JOIN eqb q ON q.bkt = c.bkt)
      |SELECT doc_id, count(*) AS n_hits,
      |  CAST(max(dot) AS BIGINT) AS max_dot, min(eval_id) AS min_eval_id
      |FROM d WHERE dot >= 100000
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q388
  /** Hard-negative mining (Similarity.hardNegatives) — the
    * contrastive-training data-prep step: per anchor embedding, the 3
    * most-similar DIFFERENT-label vectors by EXACT int8 dot (the q369
    * integer-verdict rule — ranking can never flip on float order),
    * candidates from the 16-way sign bucket with anchors probing one
    * sign flip (5 buckets each; candidates live in ONE home bucket,
    * so probing never duplicates a pair). The oracle restates
    * quantization, bucketing, the probe expansion, the dot, and the
    * (dot desc, neighbor_id) ranking bit for bit. */
  private def q388HardNegatives(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.hardNegatives(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        "label", k = 3, signBits = 4, probeFlips = 1)
      .orderBy(col("query_id"), col("rank"))

  private val q388Sql =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |sc AS (SELECT vec_id, label, e,
      |  list_max(list_transform(e, x -> abs(x))) AS scale FROM e),
      |q AS (
      |  SELECT vec_id, label,
      |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
      |    ELSE list_transform(e,
      |      x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) END
      |      AS qv
      |  FROM sc),
      |b AS (
      |  SELECT vec_id, label, qv,
      |    (CASE WHEN qv[1] > 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN qv[2] > 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN qv[3] > 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN qv[4] > 0 THEN 8 ELSE 0 END) AS bkt
      |  FROM q),
      |a AS (
      |  SELECT vec_id, label, qv, xor(bkt, m.m) AS bkt
      |  FROM b CROSS JOIN (VALUES (0), (1), (2), (4), (8)) AS m(m)),
      |d AS (
      |  SELECT a.vec_id AS query_id, a.label AS label,
      |    c.vec_id AS neighbor_id, c.label AS neighbor_label,
      |    CAST(list_aggregate(list_transform(range(1, 65),
      |      i -> CAST(a.qv[i] AS BIGINT) * c.qv[i]), 'sum') AS BIGINT)
      |      AS dot
      |  FROM a JOIN b c ON c.bkt = a.bkt
      |  WHERE a.vec_id != c.vec_id AND a.label != c.label),
      |r AS (
      |  SELECT query_id, label, neighbor_id, neighbor_label, dot,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY dot DESC, neighbor_id) AS rk
      |  FROM d)
      |SELECT query_id, label, CAST(rk AS INT) AS rank,
      |  neighbor_id, neighbor_label, dot
      |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q388_hard_negatives" -> (q388HardNegatives _),
    "q376_multiprobe_decon" -> (q376MultiProbeDecon _),
    "q375_incr_semantic" -> (q375IncrSemantic _),
    "q369_semantic_decon" -> (q369SemanticDecon _),
    "q305_mutual_nn" -> (q305MutualNn _),
    "q278_gram_matrix" -> (q278GramMatrix _),
    "q219_knn_eval" -> (q219KnnEval _),
    "q224_ann_recall" -> (q224AnnRecall _),
    "q95_array_ops" -> (q95ArrayOps _),
    "q59_quantize_int8" -> (q59Quantize _),
    "q193_mmr_diversify" -> (q193Mmr _),
    "q19_sim_bruteforce_topk" -> (q19BruteForce _),
    "q173_jl_matryoshka" -> (q173Project _),
    "q20_sim_ann_lsh" -> (q20AnnLsh _),
    "q32_sim_ann_ivf" -> (q32Ivf _),
    "q114_pq_adc" -> (q114Pq _),
  )

  val oracles: Map[String, String] = Map(
    "q388_hard_negatives" -> q388Sql,
    "q376_multiprobe_decon" -> q376Sql,
    "q375_incr_semantic" -> q375Sql,
    "q369_semantic_decon" -> q369Sql,
    "q305_mutual_nn" -> q305Sql,
    "q278_gram_matrix" -> q278Sql,
    "q219_knn_eval" -> q219Sql,
    "q224_ann_recall" -> q224Sql,
    "q95_array_ops" -> q95Sql,
    "q59_quantize_int8" -> q59Sql,
    "q193_mmr_diversify" -> q193Sql,
    "q19_sim_bruteforce_topk" -> q19Sql,
    "q173_jl_matryoshka" -> q173Sql,
    "q20_sim_ann_lsh" -> q20Sql,
    "q32_sim_ann_ivf" -> q32Sql,
    "q114_pq_adc" -> q114Sql,
  )
}
