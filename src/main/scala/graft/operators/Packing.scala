package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines (north-star extension):
  * assign documents, in stable id order, to contiguous bins of at most
  * `capacity` tokens — the standard "pack short documents into one
  * context window" preprocessing step.
  *
  * The bin of a document is floor(exclusive_prefix_sum(tokens) /
  * capacity): contiguous greedy packing. (A bin can exceed capacity only
  * by the one document that straddles its boundary — the usual
  * streaming-packing relaxation; exact first-fit is inherently
  * sequential and not a distributed operator.)
  *
  * Scale design: the global prefix sum NEVER runs as a single-partition
  * window. The frame is range-partitioned and sorted by id, then a tiny
  * per-partition totals pass (numPartitions rows to the driver) yields
  * each partition's starting offset, and the in-partition running sum is
  * a window PARTITIONED BY the partition id — every partition scans in
  * parallel. Same two-pass shape as RowNumbers.global, summing tokens
  * instead of counting rows.
  */
object Packing {

  /** (idCol, n_tokens, bin) for every row, bins packed in `idCol` order.
    * `tokens` is any integral-valued Column (e.g.
    * TextAnalysis.tokenCount(col("text"))). The input is persisted
    * MEMORY_ONLY for the totals pass + window pass — evictable (and
    * eviction-safe: recompute of the range-partitioned sort reproduces
    * the same layout), never parked on executor disk for the session
    * lifetime (same reasoning as RowNumbers.global). */
  def packByTokenBudget(df: DataFrame, idCol: String, tokens: Column,
      capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val base = df
      .select(col(idCol), tokens.cast("long").as("n_tokens"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val totals = base.groupBy(col("__pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offDf = spark.createDataFrame(
      totals.map(_._1).zip(offsets).toIndexedSeq).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offDf), Seq("__pid"))
      // exclusive prefix: running sum including self, minus self
      .withColumn("__pre",
        sum(col("n_tokens")).over(w) + col("__off") - col("n_tokens"))
      .withColumn("bin", floor(col("__pre") / capacity))
      .select(col(idCol), col("n_tokens"), col("bin"))
  }

  /** Per-bin packing summary: how full each context window came out. */
  def packingSummary(packed: DataFrame, idCol: String): DataFrame =
    packed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Strided sliding context windows over each document's token stream
    * — the "chunk long documents into max_len training sequences with
    * overlap" step that complements packByTokenBudget (which handles
    * the short side). Window w starts at token w·stride and spans up to
    * `maxLen` tokens; a window starts at every stride boundary below
    * the token count, so the tail window may be shorter.
    *
    * Output: (idCol, win_id, start_tok, win_tokens, win_hash) — the
    * md5 of the space-joined window both keys the chunk deterministically
    * and lets downstream exact-dedup run at chunk grain. Map-only: the
    * token array is materialized ONCE per row in a projection before
    * the window lambdas index into it (an inline split would recompute
    * the regex per element access — the q60/shingle pitfall), then one
    * explode. No shuffle, no state, at any corpus size. */
  def sequenceWindows(df: DataFrame, idCol: String, textCol: String,
      maxLen: Int, stride: Int): DataFrame = {
    require(maxLen > 0, "maxLen must be positive")
    require(stride > 0, "stride must be positive")
    val toks = df.select(col(idCol),
      split(graft.functions.TextAnalysis.normalizeText(col(textCol)), " ")
        .as("__tk"))
    val starts = sequence(lit(0), size(col("__tk")) - 1, lit(stride))
    // two-arg transform: (start, index) — the index IS the window id,
    // which keeps the division out of the float path entirely
    val wins = transform(starts, (s, i) => struct(i.as("win_id"),
      s.as("start"), slice(col("__tk"), s + 1, lit(maxLen)).as("w")))
    toks.select(col(idCol), explode(wins).as("win"))
      .select(col(idCol),
        col("win.win_id").cast("long").as("win_id"),
        col("win.start").cast("long").as("start_tok"),
        size(col("win.w")).cast("long").as("win_tokens"),
        md5(array_join(col("win.w"), " ")).as("win_hash"))
  }

  /** Size-balanced shard assignment for training-file writers: order
    * docs by (weight desc, id) and deal them round-robin across
    * `numShards` — the classic sorted-round-robin approximation of
    * LPT scheduling (largest items spread first, shard totals land
    * within one max-item of each other for long-tailed corpora).
    * Deterministic: same docs ⇒ same shards, any partitioning.
    *
    * The global order uses the repo's two-pass row-number scheme
    * (range partition + per-partition window + driver-bounded offset
    * table), never a single-partition window. Returns the input plus
    * (pos, shard). */
  def shardRoundRobin(df: DataFrame, idCol: String, weight: Column,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1 (got $numShards)")
    val ordered = df.withColumn("__w", weight)
      .repartitionByRange(col("__w").desc, col(idCol))
      .sortWithinPartitions(col("__w").desc, col(idCol))
    RowNumbers.global(ordered, "pos")
      .withColumn("shard", pmod(col("pos") - 1, lit(numShards.toLong)))
      .drop("__w")
  }
}
