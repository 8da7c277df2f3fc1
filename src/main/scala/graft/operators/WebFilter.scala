package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-corpus curation filters that key on the document's host name —
  * the blocklist pass every crawl-derived training pipeline runs
  * before quality scoring (cf. the URL filtering stage of C4/CCNet
  * recipes).
  */
object WebFilter {

  /** Domain-suffix blocklist match: a document's host matches a rule
    * if the rule equals the host OR any dot-boundary parent of it
    * (`a.b.c` → `a.b.c`, `b.c`, `c`), the standard registrable-domain
    * containment test. The host explodes into at most label-count
    * suffix rows (bounded ~10), then one equi-join against the rule
    * set — broadcast when small, plain shuffle otherwise; never a
    * LIKE-scan over rules. A host matching several rules counts once
    * per rule (census semantics).
    * @return per rule: (rule, n_docs, n_exact) where n_exact counts
    *   whole-host matches */
  def suffixBlocklistCensus(docs: DataFrame, idCol: String,
      hostCol: String, rules: DataFrame,
      ruleCol: String): DataFrame = {
    val suffixes = docs
      .filter(col(hostCol).isNotNull)
      .select(col(idCol).as("__id"), col(hostCol).as("__host"))
      .withColumn("__labels", split(col("__host"), "\\."))
      .select(col("__id"), col("__host"),
        explode(expr(
          "transform(sequence(1, size(__labels)), " +
            "i -> array_join(slice(__labels, i, size(__labels)), '.'))"))
          .as("__suffix"))
    suffixes
      .join(rules.select(col(ruleCol).as("__suffix")), Seq("__suffix"))
      .groupBy(col("__suffix"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__suffix") === col("__host"), 1L).otherwise(0L))
          .as("n_exact"))
      .withColumnRenamed("__suffix", "rule")
  }

  /** Parse a dotted-quad IPv4 string to its unsigned 32-bit value as a
    * BIGINT (pure integer expression tree — no UDF). Malformed input
    * (wrong arity / non-digit / octet > 255) yields NULL. */
  def ipv4ToLong(ip: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val parts = split(ip, "\\.")
    val octs = (0 until 4).map(i =>
      when(parts.getItem(i).rlike("^[0-9]{1,3}$") &&
        parts.getItem(i).cast("long") <= 255, parts.getItem(i).cast("long")))
    when(size(parts) === 4,
      octs(0) * 16777216L + octs(1) * 65536L + octs(2) * 256L + octs(3))
  }

  /** Longest-prefix-match join of IPv4 addresses against a CIDR rule
    * table (`net_long`, `prefix_len`, rule payload) — the IP-blocklist
    * primitive of crawl curation (and the router-FIB classic). Instead
    * of a non-equi range join (O(ips × rules) without an interval
    * index), each address expands to one masked key PER DISTINCT
    * PREFIX LENGTH present in the rule set (collected once — bounded
    * by 32, typically ≤5), turning LPM into an equi-join: join on
    * (prefix_len, ip >> (32-len) == net >> (32-len)), then keep the
    * max-length match per address. Rules broadcast when small; the
    * fan-out is #distinct-lengths, never #rules. All integer
    * arithmetic — shifts as power-of-two division on non-negative
    * values (trunc == floor, oracle-identical).
    * @return ips with `matched_net`, `matched_len` (NULL when no rule
    *   covers the address) */
  def longestPrefixMatch(ips: DataFrame, ipCol: String,
      rules: DataFrame): DataFrame = {
    val lens = rules.select(col("prefix_len").cast("int"))
      .distinct().collect().map(_.getInt(0)).sorted // ≤32 by contract
    require(lens.forall(l => l >= 1 && l <= 32),
      s"prefix_len out of range: ${lens.mkString(",")}")
    def masked(c: org.apache.spark.sql.Column, len: Int) =
      (c.cast("long") / lit(1L << (32 - len))).cast("long")
    val keyed = lens.map { len =>
      ips.select(col("*") +: Seq(lit(len).as("__len"),
        masked(col(ipCol), len).as("__key")): _*)
    }.reduce(_ unionAll _)
    val keyedRules = lens.map { len =>
      rules.filter(col("prefix_len") === len)
        .select(lit(len).as("__len"),
          masked(col("net_long"), len).as("__key"),
          col("net_long").as("matched_net"),
          col("prefix_len").cast("int").as("matched_len"))
    }.reduce(_ unionAll _)
    // left join keeps no-match addresses; the groupBy collapses the
    // per-length expansion back to one row per address, arg-maxing the
    // prefix length (window-free — max_by over ≤|lens| candidates)
    val ipCols = ips.columns
    keyed.join(broadcast(keyedRules), Seq("__len", "__key"), "left")
      .groupBy(ipCols.map(col): _*)
      .agg(max_by(col("matched_net"),
          coalesce(col("matched_len"), lit(-1))).as("matched_net"),
        max(col("matched_len")).as("matched_len"))
  }
}
