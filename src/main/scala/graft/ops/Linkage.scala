package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969): blocked
  * candidate pairs scored by Σ log-likelihood weights of per-field
  * agreement — the entity-resolution workload (customer deduping
  * across CRMs, author disambiguation) that q109's edit-distance dedup
  * only approximates: FS weighs EACH field by how surprising agreement
  * is (a rare name agreeing means more than a common segment), with
  * the u-probabilities (chance agreement) estimated FROM the
  * comparison space itself. Reference scope note: the reference engine
  * has no linkage surface; this extends the dedup/fuzzy family.
  *
  * The probe corpus is a DERIVED view of `customer` (the q100
  * derived-v2 discipline — the oracle replays the derivation
  * move-for-move): records with key % 7 = 0 are dropped (unmatchable),
  * % 3 = 0 get their name upper-cased (case-only drift), % 5 = 0 lose
  * their market segment (→ 'UNKNOWN'), % 4 = 0 have their balance
  * shifted +0.5 (past the ±0.02 agreement band). B-side ids are
  * offset by 10⁹.
  *
  * Blocking: (nation, segment, ⌊acctbal/5000⌋) — quasi-identifier
  * blocks whose sizes scale as N/(nations·segments·bands), the
  * standard quadratic-control; perturbed segments/balances land true
  * pairs in different blocks, the REAL blocking-recall loss the
  * pattern counts expose. The band width is the block-size knob: at
  * this corpus 5000 keeps random pairs DOMINANT in the comparison
  * space (u₁ ≈ 0.16 — a width of 100 left true pairs at 88% of
  * blocked pairs, collapsing every weight toward 0; FS calibration
  * needs chance agreement to be the norm), while at 100 TB the width
  * tightens to bound block sizes. The block join is an equi-join
  * Spark shuffles on the block key — never all-pairs.
  *
  * Scoring: agreement pattern over (name case-insensitive, name
  * exact, balance ±0.02); u_i = the observed agreement rate of field
  * i over ALL blocked pairs (exact integer counts — the chance-
  * agreement estimate inside the comparison space), m_i fixed
  * literals (0.95 / 0.70 / 0.90, the FS convention for clerical
  * m-probabilities); w_i = ln(m_i/u_i) on agree, ln((1−m_i)/(1−u_i))
  * on disagree, each rounded 12, summed as DECIMAL(28,12) — exact,
  * order-free. `is_match` tests score > 2.0 on the decimal (no ulp at
  * the threshold).
  *
  * Determinism: perturbations are pure functions of the key; the ±0.02
  * and +0.5 arithmetic is identical IEEE on both engines; u rates are
  * ratios of exact longs rounded 12. */
object Linkage {

  /** FS-scored blocked pairs between `customer` and its derived probe
    * view: (a_id, b_id, pattern, score, is_match), pattern = the
    * 3-char agreement vector. Emits only pairs with score > 0 (the
    * possible-match region), ordered by ids. */
  def q194RecordLinkage(s: SparkSession, dir: String): DataFrame =
    fsLinkage(Tables.customer(s, dir))

  /** The FS core over any customer-shaped frame (c_custkey, c_name,
    * c_nationkey, c_acctbal, c_mktsegment). NOTE the u-calibration
    * precondition: the comparison space must be dominated by CHANCE
    * pairs (u ≪ m) for the weights to separate — a toy corpus whose
    * blocks hold little besides true pairs collapses every weight
    * toward 0 (measured: sf0.001's 155-pair space scores full
    * agreement at 1.4, below the 2.0 cut; sf0.01's 6k-pair space at
    * 5.7). That is FS behaving correctly — "agreement is unsurprising
    * here" — not a scoring bug. */
  def fsLinkage(cust: DataFrame, bandWidth: Double = 5000.0): DataFrame = {
    val a = cust.select(
      col("c_custkey").as("a_id"), col("c_name").as("a_name"),
      col("c_nationkey").as("a_nat"), col("c_acctbal").as("a_bal"),
      col("c_mktsegment").as("a_seg"))
    val b = cust
      .filter(col("c_custkey") % 7 =!= 0)
      .select(
        (col("c_custkey") + lit(1000000000L)).as("b_id"),
        when(col("c_custkey") % 3 === 0, upper(col("c_name")))
          .otherwise(col("c_name")).as("b_name"),
        col("c_nationkey").as("b_nat"),
        when(col("c_custkey") % 4 === 0, col("c_acctbal") + lit(0.5))
          .otherwise(col("c_acctbal")).as("b_bal"),
        when(col("c_custkey") % 5 === 0, lit("UNKNOWN"))
          .otherwise(col("c_mktsegment")).as("b_seg"))
    def block(nat: Column, seg: Column, bal: Column): Column =
      concat_ws("|", nat.cast("string"), seg,
        floor(bal / lit(bandWidth)).cast("string"))
    val pairs = a.withColumn("blk", block(col("a_nat"), col("a_seg"), col("a_bal")))
      .join(b.withColumn("blk", block(col("b_nat"), col("b_seg"), col("b_bal"))),
        Seq("blk"))
      .withColumn("g1", (lower(col("a_name")) === lower(col("b_name"))).cast("long"))
      .withColumn("g2", (col("a_name") === col("b_name")).cast("long"))
      .withColumn("g3", (abs(col("a_bal") - col("b_bal")) <= lit(0.02)).cast("long"))
    val pp = pairs.localCheckpoint() // u-rates AND scoring read it
    val u = pp.agg(count(lit(1)).as("np"),
        sum(col("g1")).as("u1c"), sum(col("g2")).as("u2c"),
        sum(col("g3")).as("u3c"))
      .select(
        round(col("u1c").cast("double") / col("np").cast("double"), 12).as("u1"),
        round(col("u2c").cast("double") / col("np").cast("double"), 12).as("u2"),
        round(col("u3c").cast("double") / col("np").cast("double"), 12).as("u3"))
    // (m, 1-m) as independent literals: the oracle SQL writes 0.05/0.30/0.10
    // directly, and Scala's `1.0 - 0.95` is one ulp off 0.05 — feeding ln()
    // before round(...,12) that could flip a round-12 boundary on other data.
    val ms = Seq((0.95, 0.05), (0.70, 0.30), (0.90, 0.10))
    def w(g: Column, m: Double, oneMinusM: Double, uCol: Column): Column =
      when(g === 1L, round(log(lit(m) / uCol), 12))
        .otherwise(round(log(lit(oneMinusM) / (lit(1.0) - uCol)), 12))
        .cast("decimal(28,12)")
    val scored = pp.crossJoin(broadcast(u))
      .withColumn("score_d",
        w(col("g1"), ms(0)._1, ms(0)._2, col("u1")) +
          w(col("g2"), ms(1)._1, ms(1)._2, col("u2")) +
          w(col("g3"), ms(2)._1, ms(2)._2, col("u3")))
    scored
      .filter(col("score_d") > lit(0).cast("decimal(28,12)"))
      .select(col("a_id"), col("b_id"),
        concat(col("g1").cast("string"), col("g2").cast("string"),
          col("g3").cast("string")).as("pattern"),
        round(col("score_d").cast("double"), 6).as("score"),
        (col("score_d") > lit(2).cast("decimal(28,12)")).as("is_match"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
