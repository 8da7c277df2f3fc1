package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis (Agrawal & Srikant 1994's
  * frequent-pair core): for every unordered item pair appearing in a
  * basket together, its joint count, the marginals, and the standard
  * association measures — support c_ab/n and lift n·c_ab/(c_a·c_b).
  *
  * Scale design: items are first reduced to DISTINCT (basket, item)
  * rows (one hash aggregate), then pairs come from a self-equi-join on
  * the basket key with `item_a < item_b` — work is Σ_b C(k_b, 2),
  * bounded by the per-basket item count k_b, never |items|² or
  * |baskets|². A pathological mega-basket would square inside the
  * join, so `maxBasketItems` drops baskets beyond the cap (the same
  * finite-skew-cap discipline as the LSH bucket joins; dropped-basket
  * count is auditable via the difference in n_baskets). Marginals and
  * the basket total are broadcast back onto the pair table.
  */
object MarketBasket {

  /** @param df one row per (basket, item) observation (duplicates ok)
    * @param maxBasketItems drop baskets with more distinct items than
    *        this (skew guard; <=0 disables)
    * @return (item_a, item_b, c_ab, c_a, c_b, n_baskets, support,
    *         lift) — both ratios single expressions over exact ints */
  def pairLift(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketItems: Int = 1000): DataFrame = {
    val bi0 = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val bi = if (maxBasketItems <= 0) bi0 else {
      val sizes = bi0.groupBy(col("b")).agg(count(lit(1)).as("__k"))
        .filter(col("__k") <= maxBasketItems)
      bi0.join(sizes.select(col("b")), Seq("b"))
    }
    val nB = bi.agg(countDistinct(col("b")).as("n_baskets"))
    val marg = bi.groupBy(col("i")).agg(count(lit(1)).as("c"))
    val pairs = bi.as("x").join(bi.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(broadcast(marg.select(col("i").as("item_a"),
        col("c").as("c_a"))), Seq("item_a"))
      .join(broadcast(marg.select(col("i").as("item_b"),
        col("c").as("c_b"))), Seq("item_b"))
      .crossJoin(broadcast(nB))
      .select(col("item_a"), col("item_b"), col("c_ab"), col("c_a"),
        col("c_b"), col("n_baskets"),
        (col("c_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_baskets").cast("double") * col("c_ab").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double")))
          .as("lift"))
  }
}
