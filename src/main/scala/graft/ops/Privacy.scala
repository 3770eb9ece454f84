package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Access-log privacy operators — the redaction pass an s3-access-log
  * pipeline (the reference's domain: `cmd/export.py` ships raw
  * `remoteip` straight into the warehouse) needs before logs can be
  * retained long-term or joined with other datasets:
  *
  *  - '''/24 masking''': zero the host octet — the standard
  *    IP-truncation anonymization (GDPR-style), keeps network-level
  *    analytics (abuse origin, CDN split) while dropping the
  *    host-level identifier;
  *  - '''stable pseudonymization''': a salted-hash token per IP —
  *    session stitching and per-client rate analysis still work across
  *    days, but the token can't be reversed without the salt, and
  *    rotating the salt unlinks history.
  *
  * Both are pure codegen'd column expressions — at 100 TB this is a
  * narrow map fused into whatever scan precedes it (no shuffle, no UDF);
  * the demo aggregation below adds exactly one hash-partition exchange
  * on the /24 key.
  */
object Privacy {

  /** Zero the last octet: `a.b.c.d` → `a.b.c.0` (the /24 network). */
  def maskIpv4(ip: Column): Column =
    concat(regexp_extract(ip, "^(\\d+\\.\\d+\\.\\d+)\\.", 1), lit(".0"))

  /** Stable salted pseudonym: 16 hex chars of md5(salt:ip). Stable for a
    * fixed salt (joinable across runs/days), unlinkable once the salt
    * rotates. 64 bits keeps birthday collisions negligible below ~2^32
    * distinct clients. */
  def pseudonymize(ip: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), ip)), 1, 16)

  /** q44: anonymized per-/24 access summary over the synthesized event
    * log stream (same deterministic IP synthesis as q20, so the oracle
    * can mirror it): request count, distinct client IPs, distinct
    * pseudonyms, and the lexicographic first pseudonym per network.
    * `n_ips = n_pseudonyms` on every row is the built-in
    * collision-freedom check (asserted in OpsSpec, hash-checked by the
    * oracle).
    */
  def q44IpAnonymize(s: SparkSession, dir: String): DataFrame = {
    val ip = graft.queries.LogParsing.syntheticRemoteIp
    Tables.events(s, dir)
      .select(
        maskIpv4(ip).as("cidr24"),
        ip.as("ip"),
        pseudonymize(ip, "graft-salt-v1").as("pseudonym"))
      .groupBy(col("cidr24"))
      .agg(
        count(lit(1)).as("n_requests"),
        countDistinct(col("ip")).as("n_ips"),
        countDistinct(col("pseudonym")).as("n_pseudonyms"),
        min(col("pseudonym")).as("first_pseudonym"))
      .orderBy(col("cidr24"))
  }
}
