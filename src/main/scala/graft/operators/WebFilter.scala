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
}
