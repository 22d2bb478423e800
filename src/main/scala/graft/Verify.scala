package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dump(spark, sfDir, outDir)
    spark.stop()
  }

  /** Dump every query result + oracle_sql.json into `outDir`; returns the
    * names whose query threw (the driver's compare then reports them as
    * NO_OUTPUT). Shared by [[main]] and the local OracleParitySpec gate.
    */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      artifacts: Boolean = true): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val failed = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
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
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // Per-round quality artifacts (VERDICT r7 missing #2): the driver
    // runs Verify every round, so the rows-only inventory entries (ANN
    // recall, streaming scenarios) get a CURRENT-round quality proof
    // here instead of riding on a stale manually-run one. Emitted after
    // the gate artifacts and individually fenced — an artifact failure
    // must never cost correctness entries. Opt out with
    // SPARK_GRAFT_SKIP_ARTIFACTS=1 (e.g. spec runs).
    if (artifacts && !sys.env.contains("SPARK_GRAFT_SKIP_ARTIFACTS") &&
        failed.isEmpty) {
      val tag = roundTag()
      try Recall.run(spark, sfDir, s"RECALL_$tag.json")
      catch { case e: Throwable =>
        System.err.println(s"[verify] recall artifact failed: ${e.getMessage}") }
      try { StreamCheck.check(spark, s"STREAM_$tag.json"); () }
      catch { case e: Throwable =>
        System.err.println(s"[verify] stream artifact failed: ${e.getMessage}") }
    }
    failed
  }

  /** Artifact round tag: one past the newest CORRECTNESS_r{N}.json in
    * the working directory (the driver writes that file AFTER running
    * Verify, so the newest existing one is the previous round's). Falls
    * back to "latest" outside a round checkout.
    */
  private def roundTag(): String = {
    val r = "^CORRECTNESS_r(\\d+)\\.json$".r
    val seen = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .flatMap(f => r.findFirstMatchIn(f.getName).map(_.group(1).toInt))
    if (seen.isEmpty) "latest" else f"r${seen.max + 1}%02d"
  }
}
