package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Frequent co-occurring item pairs (market-basket 2-itemsets with a
  * support threshold) — the first Apriori/FP-growth level, and the one
  * that matters for curation (co-purchased parts, co-cited docs,
  * co-clicked pages feed recommendation and dedup heuristics).
  *
  * Scale shape: pair generation is IN-ROW over each basket's sorted
  * distinct-item array (the q25 join-free rule) — no self-join of the
  * item-basket relation, so the only shuffles are the basket collect
  * and the pair count, both map-side combined. Pair volume is
  * Σ |basket|²/2; baskets are naturally bounded in order-line data
  * (≤ ~10² items), and `maxBasket` drops degenerate mega-baskets (a
  * crawler "order" containing the whole catalog) on both engine and
  * oracle — the q25/q109 hot-block rule: at n items a basket emits
  * n²/2 pairs, so ONE 10⁵-item basket would dominate the whole job. */
object Baskets {

  /** Distinct unordered item pairs per basket, counted across baskets,
    * kept at `count >= minSupport`. Input: (basket_id, item). */
  def frequentPairs(rows: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long, maxBasket: Int = 1024): DataFrame = {
    val baskets = rows.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .groupBy(col("b")).agg(sort_array(collect_set(col("i"))).as("items"))
      .filter(size(col("items")).between(2, maxBasket))
    // nested transform: for items[i], pair with every later element —
    // sorted arrays make (i1 < i2) structural, no post-filter
    val pairs = baskets.select(explode(flatten(
      transform(col("items"), (x, pos) =>
        transform(slice(col("items"), pos + 2, size(col("items"))),
          y => struct(x.as("i1"), y.as("i2")))))).as("p"))
    pairs.groupBy(col("p.i1").as("i1"), col("p.i2").as("i2"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
  }

  /** q116: part pairs co-occurring in ≥ 3 orders. */
  def q116FrequentPairs(s: SparkSession, dir: String): DataFrame =
    frequentPairs(Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
      minSupport = 3L)
      .orderBy(col("i1"), col("i2"))
}
