package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Prefix-cache savings estimation — the serving/training-side read of
  * the dedup family: documents sharing a character prefix of length L
  * share a KV-cache prefix of ~L/4 tokens, so the fraction of corpus
  * text living inside shared prefixes bounds what a prefix cache (or a
  * trie-packed training layout) can save. Template-heavy corpora (the
  * common crawl reality: boilerplate heads, shared system prompts)
  * show savings exact dedup misses because the TAILS differ.
  *
  * One pass per rung of the L-ladder over a pre-projected (len, head)
  * frame: group docs by their first-L characters (docs shorter than L
  * are out of scope for that rung — a shorter shared head is counted
  * by ITS rung), count groups with ≥ 2 members. All integer exact;
  * the savings fraction is one divide (round 6). Aggregate-domain
  * throughout — the prefix groupBy is map-side combinable and the
  * ladder is 3 narrow passes, never a pair join. */
object PrefixCache {

  val Ladder: Seq[Int] = Seq(16, 64, 256)

  /** q238: per rung L — docs in scope, docs inside shared-prefix
    * groups, group count, chars a prefix cache saves ((cnt−1)·L per
    * group), and the saved fraction of in-scope corpus chars. */
  def q238PrefixCache(s: SparkSession, dir: String): DataFrame =
    prefixCacheSavings(Tables.documents(s, dir))

  /** The ladder core over any (doc_id, text) frame. */
  def prefixCacheSavings(docs: DataFrame): DataFrame = {
    val base = Par.widen(docs)
      .select(length(col("text")).cast("long").as("len"), col("text"))
    val perRung = Ladder.map { l =>
      val scoped = base.filter(col("len") >= l)
        .select(substring(col("text"), 1, l).as("p"), col("len"))
      val groups = scoped.groupBy(col("p"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2L)
      val tot = scoped.agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("n_chars"))
      groups.agg(
          coalesce(sum(col("cnt")), lit(0L)).as("shared_docs"),
          count(lit(1)).as("n_groups"),
          coalesce(sum((col("cnt") - 1L) * l.toLong), lit(0L)).as("saved_chars"))
        .crossJoin(broadcast(tot))
        .select(lit(l.toLong).as("prefix_len"), col("n_docs"),
          col("shared_docs"), col("n_groups"), col("saved_chars"),
          when(col("n_chars") > 0L,
            round(col("saved_chars").cast("double") /
              col("n_chars").cast("double"), 6)).as("saved_frac"))
    }
    perRung.reduce(_.unionByName(_)).orderBy(col("prefix_len"))
  }
}
