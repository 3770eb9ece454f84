package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic train/val/test assignment by content-id hash — the one
  * split expression shared by every split-aware operator (q32 summary,
  * q43 decontamination). Membership is a pure function of the id: stable
  * across runs, engines, partitionings and retries, so train/test never
  * bleed when a stage is recomputed. The 'cc'/'e6' byte boundaries split
  * the first md5 byte ~80/10/10.
  */
object Splits {
  def of(id: Column): Column = {
    val h = substring(md5(id.cast("string")), 1, 2)
    when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
  }

  /** Chi-square balance audit of the hash split across strata — the
    * release check that a per-source slice of the corpus isn't
    * accidentally over-represented in val/test (which would make eval
    * numbers on that source meaningless). Observed per-(source, split)
    * counts vs the corpus-wide split shares; χ² with 2 dof, flagged
    * above the p≈0.05 critical value 5.991.
    *
    * Scale shape: one map-side-combined conditional aggregate to
    * |sources| rows; the global shares ride a broadcast 1-row cross
    * join (the q41 idiom). The χ² is a FIXED left-to-right three-term
    * expression over exact longs, so the doubles are engine-identical;
    * rounded to 6 regardless. */
  def balanceAudit(rows: DataFrame, stratumCol: String, idCol: String): DataFrame = {
    val d = rows.select(col(stratumCol).as("stratum"),
      of(col(idCol)).as("split"))
    val per = d.groupBy(col("stratum")).agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val tot = per.agg(
      sum(col("n_train")).as("t_train"), sum(col("n_val")).as("t_val"),
      sum(col("n_test")).as("t_test"))
    val n = (col("n_train") + col("n_val") + col("n_test")).cast("double")
    val tAll = (col("t_train") + col("t_val") + col("t_test")).cast("double")
    def term(o: Column, t: Column): Column = {
      val e = n * (t.cast("double") / tAll)
      when(e > 0.0, (o.cast("double") - e) * (o.cast("double") - e) / e)
        .otherwise(lit(0.0))
    }
    per.crossJoin(broadcast(tot))
      .withColumn("chi2", round(
        term(col("n_train"), col("t_train")) +
          term(col("n_val"), col("t_val")) +
          term(col("n_test"), col("t_test")), 6))
      .select(col("stratum"), col("n_train"), col("n_val"), col("n_test"),
        col("chi2"), (col("chi2") > 5.991).as("flagged"))
  }

  /** q126: split balance over documents by source. */
  def q126SplitBalance(s: SparkSession, dir: String): DataFrame =
    balanceAudit(Tables.documents(s, dir), "source", "doc_id")
      .withColumnRenamed("stratum", "source")
      .orderBy(col("source"))
}
