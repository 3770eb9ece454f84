package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Distribution-drift detection via the Population Stability Index —
  * the monitoring workload behind every production model/pipeline:
  * compare a feature's distribution in the current window against a
  * baseline window, PSI = Σ_bins (p_cur − p_base)·ln(p_cur/p_base),
  * with the industry reading (PSI < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted). Reference scope note: the reference engine has no
  * monitoring surface; this is the extension layer's drift check over
  * the same event history the rollup stores summarize.
  *
  * Scale shape: the corpus collapses in ONE map-side-combined hash
  * aggregate to (feature, bin, period) counts — every feature's bin
  * assignment is an in-row expression exploded into the same shuffle
  * (F features = F in-row structs per event, one aggregate, not F
  * scans). Everything after the first aggregate is bin-cardinality-
  * bound (≤ |event types| + 24 rows here): per-feature totals attach
  * by a broadcast join over that tiny frame. The baseline/current
  * split day derives from a 1-row min/max aggregate attached by
  * broadcast — no driver round trip in the plan contract (the single
  * `head()` reads a 1-row frame, the q141 precedent).
  *
  * Determinism: counts are exact longs; smoothed probabilities use
  * Laplace +1/2 with the feature's OBSERVED bin count (an exact long),
  * so no bin has p=0 and ln is total; p and psi terms are fixed
  * left-to-right double expressions rounded to 6 (the q41 rule); the
  * per-feature PSI total sums the ROUNDED terms through
  * decimal(18,6) — exact and order-independent, so the oracle's sum
  * order cannot ulp-drift the hash. */
object Drift {

  /** PSI of the second half of the event timeline vs the first, over
    * two features — `event_type` (categorical) and hour-of-day (24
    * integer bins; zero-padded so bin strings sort correctly). Emits
    * per-(feature, bin) rows with counts, smoothed shares and the PSI
    * term, plus a `__total` row per feature carrying the PSI and its
    * drift verdict. `events` needs (`ts` epoch-nanos long,
    * `event_type` string). */
  def psiOverEvents(ev: DataFrame): DataFrame = {
    // the split day: first half of the covered days is the baseline.
    // 1-row aggregate; riding it in by broadcast keeps the plan
    // driver-free (crossJoin(broadcast(1 row)) — the benign idiom).
    val span = ev.agg(
        min(expr("ts DIV 86400000000000")).as("__d0"),
        max(expr("ts DIV 86400000000000")).as("__d1"))
      .select(expr("(__d0 + __d1 + 1) DIV 2").as("__split"))
    val binned = ev.crossJoin(broadcast(span))
      .withColumn("__period",
        when(expr("ts DIV 86400000000000") < col("__split"), "base")
          .otherwise("cur"))
      .select(col("__period"), explode(array(
        struct(lit("event_type").as("feature"), col("event_type").as("bin")),
        struct(lit("hour_of_day").as("feature"),
          lpad(expr("(ts DIV 3600000000000) % 24").cast("string"), 2, "0")
            .as("bin")))).as("fb"))
      .select(col("fb.feature"), col("fb.bin"), col("__period"))
    // ONE corpus-collapsing aggregate; all below is bin-bound
    val counts = binned.groupBy(col("feature"), col("bin"))
      .agg(sum(when(col("__period") === "base", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("__period") === "cur", 1L).otherwise(0L)).as("n_cur"))
    val featTotals = counts.groupBy(col("feature"))
      .agg(sum(col("n_base")).as("t_base"), sum(col("n_cur")).as("t_cur"),
        count(lit(1)).as("n_bins"))
    val pB = (col("n_base").cast("double") + lit(0.5)) /
      (col("t_base").cast("double") + lit(0.5) * col("n_bins").cast("double"))
    val pC = (col("n_cur").cast("double") + lit(0.5)) /
      (col("t_cur").cast("double") + lit(0.5) * col("n_bins").cast("double"))
    val terms = counts.join(broadcast(featTotals), Seq("feature"))
      .withColumn("p_base", round(pB, 6))
      .withColumn("p_cur", round(pC, 6))
      .withColumn("psi_term", round((pC - pB) * log(pC / pB), 6))
    val perBin = terms.select(col("feature"), col("bin"),
      col("n_base"), col("n_cur"), col("p_base"), col("p_cur"),
      col("psi_term"), lit(null).cast("string").as("verdict"))
    // feature totals: decimal sum of the rounded terms — exact, so the
    // oracle's aggregation order can't drift the hash
    val totals = terms.groupBy(col("feature"))
      .agg(sum(col("n_base")).as("n_base"), sum(col("n_cur")).as("n_cur"),
        sum(col("psi_term").cast("decimal(18,6)")).cast("double").as("psi"))
      .select(col("feature"), lit("__total").as("bin"),
        col("n_base"), col("n_cur"),
        lit(null).cast("double").as("p_base"),
        lit(null).cast("double").as("p_cur"),
        col("psi").as("psi_term"),
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "drifting")
          .otherwise("shifted").as("verdict"))
    perBin.unionByName(totals).orderBy(col("feature"), col("bin"))
  }

  /** q144: [[psiOverEvents]] on the driver's events table. */
  def q144PsiDrift(s: SparkSession, dir: String): DataFrame =
    psiOverEvents(Tables.events(s, dir))

  /** q186: exact two-sample KOLMOGOROV–SMIRNOV drift — for every
    * source, the KS statistic D = max_v |F_source(v) − F_rest(v)| of
    * its token-count distribution against the rest of the corpus, plus
    * the value where the gap peaks. The exact-ECDF complement to
    * q144's binned PSI: PSI needs a bin design and saturates on tail
    * mass; KS is bin-free, so it catches a source whose length
    * distribution silently shifts inside one PSI bin (truncation bugs,
    * template changes).
    *
    * Scale shape (the q121 ECDF discipline): ONE (source × value)
    * count aggregate off the scan (map-side combined); the evaluation
    * grid is sources × DISTINCT VALUES — an aggregated frame, never
    * raw rows — built by a broadcast cross join of the two tiny
    * dimension tables; both cumulatives are windows OVER THAT GRID
    * (per-source partitions of ≤ |values| rows). F_rest comes from the
    * global cumulative minus the source's — no second corpus pass, no
    * per-pair recount.
    *
    * Determinism: counts exact; each F is one double divide rounded 12;
    * D = max of |difference of rounded doubles| (order-free), the peak
    * value = min v attaining D (exact tie rule). */
  def q186KsDrift(s: SparkSession, dir: String): DataFrame =
    ksDrift(Tables.documents(s, dir)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("v")))

  /** The reusable KS core over any (source, v: long) frame. */
  def ksDrift(values: DataFrame): DataFrame = {
    val v = values
    // pinned: five consumers below (ns, the global cumulative, the grid
    // join, totals) — unpinned, each re-runs the corpus scan (and the
    // caller's tokenize) per reference (the r14 soak lesson)
    val counts = v.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val ns = counts.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val globalCum = PrefixSum.runningSum(
        counts.groupBy(col("v")).agg(sum(col("c")).as("cg")),
        col("v"), col("cg"), "cum_g") // two-level: a 100 TB value
      .select(col("v"), col("cum_g")) // histogram never single-partitions
    val total = counts.agg(sum(col("c")).as("n_all"))
    // the evaluation grid: every source × every distinct value —
    // aggregated dimensions only (a step function must be read at ALL
    // corpus values, including ones the source never emits)
    val grid = ns.crossJoin(globalCum.select(col("v")))
      .join(counts, Seq("source", "v"), "left")
      .withColumn("cum_s", coalesce(
        sum(col("c")).over(Window.partitionBy(col("source")).orderBy(col("v"))),
        lit(0L)))
      .join(globalCum, Seq("v"))
      .crossJoin(broadcast(total))
      .withColumn("gap", abs(
        round(col("cum_s").cast("double") / col("n_s").cast("double"), 12) -
        round((col("cum_g") - col("cum_s")).cast("double") /
          (col("n_all") - col("n_s")).cast("double"), 12)))
    val g = grid.localCheckpoint() // aggregated |sources|×|values| frame,
                                   // read by the max AND the argmax below
    val d = g.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_source"),
        max(col("n_all") - col("n_s")).as("n_rest"),
        max(col("gap")).as("ks_d"))
    val at = g.select(col("source"), col("v"), col("gap"))
      .join(d.select(col("source"), col("ks_d")), Seq("source"))
      .filter(col("gap") === col("ks_d"))
      .groupBy(col("source")).agg(min(col("v")).as("at_value"))
    d.join(at, Seq("source"))
      .select(col("source"), col("n_source"), col("n_rest"),
        col("ks_d"), col("at_value"))
      .orderBy(col("source"))
  }

  /** q187: MANN–WHITNEY effect size per source — the AUC (probability
    * that a random doc of the source is longer than a random doc of
    * the rest, ties counted half) and its rank-biserial form 2·AUC−1.
    * The DIRECTIONAL companion of q186's KS: KS says the distributions
    * differ, AUC says which way and by how much — the pair a drift
    * triage reads together.
    *
    * Exactness trick: U needs only the aggregated value counts —
    *   2U = Σ_v c_s(v) · (2·cum_rest(<v) + c_rest(v))
    * is an exact integer (the ×2 absorbs the half-tie credit), summed
    * as DECIMAL(38,0) so 100 TB corpus sizes cannot overflow; the one
    * division rounds 12. One (source × value) count pass serves every
    * source (rest counts = global − source, as q186); no window
    * touches raw rows. */
  def q187RankSumEffect(s: SparkSession, dir: String): DataFrame =
    rankSumEffect(Tables.documents(s, dir)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("v")))

  /** The reusable core over any (source, v: long) frame. */
  def rankSumEffect(values: DataFrame): DataFrame = {
    val counts = values.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // four consumers (the ksDrift pin note)
    val ns = counts.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val g = PrefixSum.runningSum(
      counts.groupBy(col("v")).agg(sum(col("c")).as("cg")),
      col("v"), col("cg"), "cum_g") // the two-level prefix sum
    val total = counts.agg(sum(col("c")).as("n_all"))
    val withCums = counts
      .withColumn("cum_s", sum(col("c")).over(
        Window.partitionBy(col("source")).orderBy(col("v"))))
      .join(g, Seq("v"))
      .crossJoin(broadcast(total))
      // rest counts at v and strictly below v, by subtraction
      .withColumn("c_r", col("cg") - col("c"))
      .withColumn("cum_r_below",
        (col("cum_g") - col("cg")) - (col("cum_s") - col("c")))
    withCums
      .withColumn("u2_term",
        (col("c") * (lit(2L) * col("cum_r_below") + col("c_r")))
          .cast("decimal(38,0)"))
      .groupBy(col("source"))
      .agg(sum(col("u2_term")).as("u2"),
        max(col("n_all")).as("n_all"))
      .join(ns, Seq("source"))
      .select(col("source"), col("n_s").as("n_source"),
        (col("n_all") - col("n_s")).as("n_rest"),
        round(col("u2").cast("double") /
          (lit(2.0) * col("n_s").cast("double") *
            (col("n_all") - col("n_s")).cast("double")), 12).as("auc"))
      .withColumn("rank_biserial", round(lit(2.0) * col("auc") - lit(1.0), 12))
      .orderBy(col("source"))
  }

  /** q230: exact 1-D WASSERSTEIN-1 (earth mover's) drift per source —
    * the MAGNITUDE companion to q186's KS: KS reads the single worst
    * ECDF gap (a probability), W1 integrates the gap over the value
    * axis (∫|F_s − F_rest| dv — expected tokens a doc must "move" to
    * turn one distribution into the other). A source whose lengths
    * shift uniformly by 50 tokens moves W1 by ≈ 50 while KS saturates;
    * the two together say "how wrong and by how much".
    *
    * Exact: on an integer domain W1 = Σ_i |F_s − F_rest|(v_i) ·
    * (v_{i+1} − v_i). Cross-multiplied to integers: |cum_s·n_r −
    * cum_r·n_s| · gap with ONE divide by n_s·n_r at the end (round 6).
    * Widths: products via (19,0)×(19,0) factors — (38,0) in both
    * engines (DuckDB multiply width = p1+p2 ≤ 38, exactly at the cap),
    * so the cross-multiply is exact for any long-typed counts; the
    * binding bound is the (25,0) re-narrow before the gap product
    * ((25,0)×(12,0) → (38,0)), which holds while cum_s·n_rest < 10²⁵,
    * i.e. corpora to n < 10¹² docs with gaps to 10¹². Both engines
    * share every width, so overflow (never hit inside the bound) would
    * at least surface identically.
    *
    * Scale shape: identical to q186 — one (source × value) count
    * aggregate, the sources × distinct-values broadcast grid, windows
    * over aggregated rows only. */
  def q230WassersteinDrift(s: SparkSession, dir: String): DataFrame =
    wassersteinDrift(Tables.documents(s, dir)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("v")))

  /** The reusable W1 core over any (source, v: long) frame. */
  def wassersteinDrift(values: DataFrame): DataFrame = {
    val counts = values.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // four consumers (the ksDrift pin note)
    val ns = counts.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val globalCum = PrefixSum.runningSum(
        counts.groupBy(col("v")).agg(sum(col("c")).as("cg")),
        col("v"), col("cg"), "cum_g") // two-level: a 100 TB value
      .select(col("v"), col("cum_g")) // histogram never single-partitions
    val total = counts.agg(sum(col("c")).as("n_all"))
    val ws = Window.partitionBy(col("source")).orderBy(col("v"))
    ns.crossJoin(globalCum.select(col("v")))
      .join(counts, Seq("source", "v"), "left")
      .withColumn("cum_s", coalesce(sum(col("c")).over(ws), lit(0L)))
      .join(globalCum, Seq("v"))
      .crossJoin(broadcast(total))
      .withColumn("gap", coalesce(lead(col("v"), 1).over(ws) - col("v"), lit(0L)))
      .withColumn("diff", abs(
        col("cum_s").cast("decimal(19,0)") *
          (col("n_all") - col("n_s")).cast("decimal(19,0)") -
        (col("cum_g") - col("cum_s")).cast("decimal(19,0)") *
          col("n_s").cast("decimal(19,0)")))
      .withColumn("term", col("diff").cast("decimal(25,0)") *
        col("gap").cast("decimal(12,0)"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_source"),
        max(col("n_all") - col("n_s")).as("n_rest"),
        sum(col("term")).as("num"))
      .withColumn("w1", round(col("num").cast("double") /
        (col("n_source").cast("double") * col("n_rest").cast("double")), 6))
      .select(col("source"), col("n_source"), col("n_rest"), col("w1"))
      .orderBy(col("source"))
  }

  /** q241: WALD–WOLFOWITZ RUNS TEST per source — is the doc SEQUENCE
    * random, not just the distribution right? A shard written sorted
    * by length, an ingest that batches short docs together, a
    * curriculum leak — all pass every distributional check (KS, W1,
    * quantiles agree exactly) and fail here: the signs of
    * (token count − source median) in doc_id order clump into too few
    * runs (sortedness) or alternate into too many (interleaving).
    *
    * Exact ingredients: lower median via the q88 histogram, ties
    * (x = med) dropped per standard practice, R = 1 + sign changes
    * over the per-source ordered sequence, then the closed-form
    * μ_R = 1 + 2n₁n₂/n and σ²_R = 2n₁n₂(2n₁n₂ − n)/(n²(n − 1)) in
    * fixed-shape double arithmetic (2n₁n₂ would overflow a long at
    * corpus scale — both engines compute it as doubles), z rounded 6;
    * degenerate one-sided sequences (n₁ = 0 or n₂ = 0) → NULL z. */
  def q241RunsTest(s: SparkSession, dir: String): DataFrame =
    runsTest(Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("v")))

  /** The runs-test core over any (source, doc_id, v: long) frame. */
  def runsTest(values0: DataFrame): DataFrame = {
    // pinned: the histogram pass, the bounds pass and the signed join
    // all read it, and the caller's lineage tokenizes
    val values = values0.localCheckpoint()
    val hist = values.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c"))
    val totals = hist.groupBy(col("source").as("ts")).agg(sum(col("c")).as("n0"))
    val wv = Window.partitionBy(col("source")).orderBy(col("v"))
    val med = hist.withColumn("cum", sum(col("c")).over(wv))
      .join(broadcast(totals), col("source") === col("ts"))
      .groupBy(col("source"))
      .agg(min(when(col("cum") >= expr("(n0 + 1) DIV 2"), col("v"))).as("med"))
    val signed = values.join(broadcast(med), Seq("source"))
      .filter(col("v") =!= col("med"))
      .withColumn("sgn", when(col("v") > col("med"), 1L).otherwise(0L))
    // SEGMENTED run counting (the r13 verdict's per-source-funnel fix):
    // the naive lag window puts each source's ENTIRE doc sequence
    // through one partition — the heaviest per-source funnel in the
    // suite (3.9× wall at 10× soak). Instead doc_id is range-chunked
    // with the PrefixSum monotone bucketing (broadcast 1-row min/max,
    // no sampling pass): within-(source, chunk) breaks come from
    // BOUNDED lag windows, and chunks stitch over the aggregated
    // sources × ≤P frame — a boundary whose first sign continues the
    // previous PRESENT chunk's last sign is not a break (chunk order
    // among present chunks IS doc_id order, the mapping being
    // monotone). Run counts are identical by construction; only the
    // partition sizes change.
    val p = values.sparkSession.sparkContext.defaultParallelism
    // bounds from the INPUT frame, not `signed`: the agg only touches
    // doc_id, so Catalyst prunes the (expensive) value column from this
    // pass; bounds-from-signed would re-run the median join AND the
    // upstream tokenize a second time (r14 soak lesson)
    val bounds = values.agg(min(col("doc_id").cast("double")).as("__lo"),
      max(col("doc_id").cast("double")).as("__hi"))
    val chunked = signed.crossJoin(broadcast(bounds))
      .withColumn("chunk", least(lit(p - 1L), greatest(lit(0L),
        floor((col("doc_id").cast("double") - col("__lo")) * lit(p.toDouble) /
          (col("__hi") - col("__lo") + lit(1.0))).cast("long"))))
      .drop("__lo", "__hi")
    val wc = Window.partitionBy(col("source"), col("chunk")).orderBy(col("doc_id"))
    val perChunk = chunked
      .withColumn("brk", when(lag(col("sgn"), 1).over(wc).isNull ||
        lag(col("sgn"), 1).over(wc) =!= col("sgn"), 1L).otherwise(0L))
      .groupBy(col("source"), col("chunk"))
      .agg(count(lit(1)).as("n_c"), sum(col("sgn")).as("plus_c"),
        sum(col("brk")).as("brk_c"),
        min_by(col("sgn"), col("doc_id")).as("first_sgn"),
        max_by(col("sgn"), col("doc_id")).as("last_sgn"))
    val ws = Window.partitionBy(col("source")).orderBy(col("chunk"))
    perChunk
      .withColumn("dup", when(
        lag(col("last_sgn"), 1).over(ws).isNotNull &&
          lag(col("last_sgn"), 1).over(ws) === col("first_sgn"), 1L)
        .otherwise(0L))
      .groupBy(col("source"))
      .agg(sum(col("n_c")).as("n_used"), sum(col("plus_c")).as("n_plus"),
        (sum(col("n_c")) - sum(col("plus_c"))).as("n_minus"),
        (sum(col("brk_c")) - sum(col("dup"))).as("runs"))
      .withColumn("a", lit(2.0) * col("n_plus").cast("double") *
        col("n_minus").cast("double"))
      .withColumn("z",
        // n_used > 2 is the positive-variance guard: at n₁ = n₂ = 1 the
        // variance term a·(a − n) is 0 (a = n = 2) and z would be 0/0 —
        // NaN on Spark, NULL-vs-NaN formatting risk against the oracle.
        // Given n₁, n₂ ≥ 1, a − n = 2n₁n₂ − n₁ − n₂ > 0 ⟺ n > 2.
        when(col("n_plus") > 0L && col("n_minus") > 0L && col("n_used") > 2L,
          round((col("runs").cast("double") -
            (lit(1.0) + col("a") / col("n_used").cast("double"))) /
            sqrt(col("a") * (col("a") - col("n_used").cast("double")) /
              (col("n_used").cast("double") * col("n_used").cast("double") *
                (col("n_used").cast("double") - lit(1.0)))), 6)))
      .select(col("source"), col("n_used"), col("n_plus"), col("n_minus"),
        col("runs"), col("z"))
      .orderBy(col("source"))
  }
}
