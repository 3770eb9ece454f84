package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.Tables
import graft.functions.{BloomAgg, BloomMightContain}

/** Bloom-pruned semi join — the explicit form of Spark's internal
  * runtime row-level filtering, as a reusable operator.
  *
  * The 100 TB problem it solves: a semi join whose build side has too
  * many ROWS to broadcast still usually has a key set whose BITS fit
  * in ~100 KiB–10 MiB. Shuffling the whole probe side to discover
  * that 95% of it matches nothing is the dominant cost of selective
  * fact⋈fact joins; a broadcast Bloom filter drops those rows at the
  * scan, before the exchange, and the exact semi join afterwards only
  * pays for survivors (true matches + FPP·non-matches). False
  * positives cannot corrupt the answer — the exact join removes them
  * — and false negatives don't exist, so pruned ≡ unpruned always.
  *
  * Shape: one tiny 1-row aggregate (the filter), one
  * `crossJoin(broadcast(...))` to attach it (the repo's standing
  * 1-row-aggregate idiom), a codegen'd `bloom_might_contain` in the
  * scan stage, then the ordinary semi join on survivors.
  */
object BloomPrune {

  /** The Bloom filter of `keys` as a 1-row DataFrame (column `bf`). */
  def bloomOf(keys: DataFrame, keyCol: String,
              numBits: Int = 1 << 20, k: Int = 6): DataFrame =
    keys.agg(Bridge.column(
      BloomAgg(Bridge.expression(col(keyCol).cast("long")), numBits, k)
        .toAggregateExpression()).as("bf"))

  def mightContain(bloom: Column, key: Column): Column =
    Bridge.column(BloomMightContain(
      Bridge.expression(bloom), Bridge.expression(key.cast("long"))))

  /** `probe ⋉ build` with a broadcast-Bloom prefilter before the exact
    * semi join. Result is row-identical to the plain semi join. */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    numBits: Int = 1 << 20, k: Int = 6): DataFrame = {
    val bf = bloomOf(build.select(col(buildKey)), buildKey, numBits, k)
    probe.crossJoin(broadcast(bf))
      .filter(mightContain(col("bf"), col(probeKey)))
      .drop("bf")
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }

  /** q112: lineitems of high-value orders (o_totalprice > 400000),
    * summarized per return flag — the selective fact⋈fact semi join,
    * bloom-pruned. Hash-must-equal the plain semi join (FPP is invisible
    * in the result, by construction). */
  def q112BloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val hi = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey").as("l_orderkey"))
    bloomSemiJoin(Tables.lineitem(s, dir), "l_orderkey", hi, "l_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(28,6)")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }
}
