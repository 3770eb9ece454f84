package graft

import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for the export pipeline. */
object EtlProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/tmp/etlprobe/in"
    val spark = GraftSession.create()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val lines = spark.read.text(s"$src/*")
    time("read+count raw")(lines.count())
    time("tokenize only")(lines.select(graft.functions.exprs.tokenize_s3_log(col("value")).as("t"))
      .select(sum(size(col("t")))).collect())
    time("parse+enrich count")(graft.etl.Enrich.parseLines(lines).count())
    val parsed = graft.etl.Enrich.parseLines(lines)
    time("full write")(graft.etl.ExportJob.write(parsed, "/tmp/etlprobe/out"))
    time("re-read count")(spark.read.parquet("/tmp/etlprobe/out").count())
    spark.stop()
  }
}
