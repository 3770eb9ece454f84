package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, MapType, StructType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Columns the driver's pandas-based gate cannot sort/hash. A declared
    * query emitting one of these passed the round-8 LOCAL mirror (which
    * tuple-ized arrays) and then failed the real gate with
    * `unhashable type: numpy.ndarray` — q91/q92/q98. The contract is
    * now enforced at dump time on BOTH paths: stringify (q35's
    * array_join pattern) before declaring. */
  def forbiddenGateColumns(schema: StructType): Seq[String] = {
    def bad(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | BinaryType | _: StructType => true
      case _ => false
    }
    schema.fields.collect { case f if bad(f.dataType) => s"${f.name}: ${f.dataType.simpleString}" }
  }

  def main(args: Array[String]): Unit = {
    // the dumped oracle SQL interpolates THIS run's sidecar paths and
    // the DuckDB compare reads them after we exit — keep the root
    Sidecars.keepOnExit()
    // optional 3rd arg: comma-separated query-name filter (local
    // pre-flight of a single query; the driver always passes two args)
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // gate-CONTRACT violations (array/map/binary outputs) are tracked
    // separately from runtime failures: the blanket catch below keeps a
    // flaky query from killing the whole dump, but a contract violation
    // is deterministic and must be unmissable at dump time (ADVICE r9 —
    // it used to be swallowed and resurface later as an opaque
    // "unreadable" gate failure), so the run exits non-zero for those.
    var gateViolations = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      spark.catalog.clearCache() // queries that cache leave unreachable entries
      try {
        val df = fn(spark, sfDir)
        val bad = forbiddenGateColumns(df.schema)
        if (bad.nonEmpty)
          // refuse to dump: the driver gate would die in pandas sort_values
          // anyway (round-8 q91/q92/q98 class) — fail HERE with the fix named
          throw new IllegalStateException(
            s"gate-incompatible output columns [${bad.mkString("; ")}] — " +
            "stringify with array_join/concat_ws (q35 pattern) on engine AND oracle")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch {
        case e: IllegalStateException if e.getMessage != null &&
            e.getMessage.startsWith("gate-incompatible") =>
          gateViolations += 1
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (gateViolations > 0) {
      System.err.println(
        s"[verify] $gateViolations gate-incompatible quer${if (gateViolations == 1) "y" else "ies"} — exiting non-zero")
      sys.exit(2)
    }
  }
}
