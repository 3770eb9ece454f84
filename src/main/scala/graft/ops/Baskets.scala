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

  /** Item-item cosine similarity from basket co-occurrence —
    * `cos(i,j) = |baskets(i) ∩ baskets(j)| / √(|baskets(i)|·|baskets(j)|)`,
    * the binary-vector cosine that drives item-to-item collaborative
    * filtering (Linden, Smith & York, IEEE Internet Computing 2003).
    * Reuses [[frequentPairs]]' bounded in-row numerators; the per-item
    * frequencies are one more map-side-combined aggregate joined onto
    * the (already support-thinned) pair set — never onto the raw pair
    * stream. Cosine divides exact longs in double and rounds to 6 (the
    * q34 determinism idiom). */
  def itemCosine(rows: DataFrame, basketCol: String, itemCol: String,
                 minSupport: Long, minCos: Double,
                 maxBasket: Int = 1024): DataFrame = {
    val pairs = frequentPairs(rows, basketCol, itemCol, minSupport, maxBasket)
    val freq = rows.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
      .groupBy(col("i")).agg(count(lit(1)).as("f"))
    pairs
      .join(freq.select(col("i").as("i1"), col("f").as("f1")), Seq("i1"))
      .join(freq.select(col("i").as("i2"), col("f").as("f2")), Seq("i2"))
      .withColumn("cos",
        round(col("n").cast("double") / sqrt((col("f1") * col("f2")).cast("double")), 6))
      .filter(col("n").cast("double") / sqrt((col("f1") * col("f2")).cast("double")) >= minCos)
      .select(col("i1"), col("i2"), col("n"), col("f1"), col("f2"), col("cos"))
  }

  /** q120: product families — connected components over the q116
    * frequent-pair graph (the composition query: co-occurrence edges →
    * q40's pointer-jumping CC), every part labeled with its family's
    * canonical min-id and size; parts in no frequent pair are singleton
    * families. The recommendation-side analogue of near-dup clustering:
    * substitutable/bundled items transitively group. */
  def q120ProductFamilies(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val pairs = frequentPairs(li, "l_orderkey", "l_partkey", minSupport = 3L)
      .select(col("i1").as("d1"), col("i2").as("d2"))
    val nodes = li.select(col("l_partkey").as("id")).distinct()
    val cc = Dedup.connectedComponents(nodes, pairs)
    val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("family_size"))
    cc.join(sizes, Seq("component"))
      .select(col("id").as("part_id"), col("component").as("family"),
        col("family_size"))
      .orderBy(col("part_id"))
  }

  /** q118: item-item cosine over order baskets (support ≥ 2,
    * cos ≥ 0.08 — the sparse TPC-H-ish baskets top out near 0.14). */
  def q118ItemCosine(s: SparkSession, dir: String): DataFrame =
    itemCosine(Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
      minSupport = 2L, minCos = 0.08)
      .orderBy(col("i1"), col("i2"))
}
