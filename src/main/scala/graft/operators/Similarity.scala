package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star extension):
  * brute-force cosine top-k as the exact baseline, and random-hyperplane
  * LSH bucketing as the approximate scale path.
  *
  * Scale design (100 TB):
  *  - brute force is O(|queries| x |corpus|): fine when the query set is
  *    small (broadcast the queries, stream the corpus — one map-side pass,
  *    partial top-k per partition via the window, no corpus shuffle).
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

  /** Cosine similarity with deterministic in-order summation. */
  def cosine(a: Column, b: Column): Column = Dedup.cosine(a, b)

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
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(embCol).as("__qe")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("__qe"), col("__ce")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    * every vector to its nearest centroid; a query only scores vectors
    * in its own centroid's list. `centroids` is any small DataFrame of
    * (centroid_id, centroid embedding) — at real scale produced by
    * k-means; callers wanting deterministic/oracle-checkable behavior
    * pass a fixed subset of the corpus.
    *
    * Scale: assignment is a broadcast cross of corpus x centroids
    * (k centroids are tiny) + one shuffle keyed by centroid for the
    * probe join; nprobe>1 would widen recall by probing the next
    * nearest centroids. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int,
      centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    def assign(df: DataFrame, outId: String): DataFrame = {
      val c = broadcast(centroids.select(col("centroid_id"),
        col("centroid").as("__cv")))
      val w = Window.partitionBy(col(outId))
        .orderBy(col("__cscore").desc, col("centroid_id"))
      df.select(col(idCol).as(outId), col(embCol).as("__v"))
        .join(c)
        .withColumn("__cscore", cosine(col("__v"), col("__cv")))
        .withColumn("__crn", row_number().over(w))
        .filter(col("__crn") === 1)
        .select(col(outId), col("__v"), col("centroid_id"))
    }

    val qa = assign(queries, "query_id")
    val ca = assign(corpus, "neighbor_id")
      .withColumnRenamed("__v", "__cvv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    qa.join(ca, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("__v"), col("__cvv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Approximate top-k: candidates limited to the query's LSH bucket.
    * Same output shape as bruteForceTopK (rank within bucket). */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int,
      planes: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qe"),
      lshBucket(col(embCol), planes).as("__qb"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"),
      lshBucket(col(embCol), planes).as("__cb"))
    val scored = q.join(c, col("__qb") === col("__cb") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("__qe"), col("__ce")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
