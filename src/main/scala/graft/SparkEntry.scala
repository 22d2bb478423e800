package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2B); each entry has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (approx sketches, streaming, LSH), in which case the
  * driver records a rows-only check and a ScalaTest spec covers semantics.
  */
object SparkEntry {

  /** Flagship: the reference's own pipeline shape (NDJSON → filter →
    * nested projection → typed rows) on the Lichess-shaped sample, then
    * the TPC-H-Q1-shaped aggregate on sf0.001 joined in as a sanity
    * cross-check; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val games = graft.pipeline.ChessPipeline
      .puzzleGames(spark, graft.pipeline.ChessPipeline.samplePath).toDF()
    val agg = Aggregates.queries("a2_group_agg")(spark, "/root/testdata/sf0.001")
    games.crossJoin(agg.agg(count(lit(1)).as("q1_groups")))
  }

  private val modules: Seq[(Map[String, Tables.Q], Map[String, String])] = Seq(
    (Projections.queries, Projections.oracles),
    (Aggregates.queries, Aggregates.oracles),
    (Joins.queries, Joins.oracles),
    (Windows.queries, Windows.oracles),
    (SetOps.queries, SetOps.oracles),
    (graft.functions.ScalarFns.queries, graft.functions.ScalarFns.oracles),
    (Dedup.queries, Dedup.oracles),
    (Similarity.queries, Similarity.oracles),
    (TextAnalysis.queries, TextAnalysis.oracles),
    (Multimodal.queries, Multimodal.oracles),
    (graft.sources.Ingest.queries, graft.sources.Ingest.oracles),
    (SqlFrontend.queries, SqlFrontend.oracles),
    (Sketches.queries, Sketches.oracles),
    (PipelineOps.queries, PipelineOps.oracles),
    (Pq.queries, Pq.oracles),
    (Bpe.queries, Bpe.oracles),
    (graft.streaming.Streams.queries, graft.streaming.Streams.oracles)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** Diagnostic-only entries excluded from the default bench inventory
    * (VERDICT r4 item 5). Still first-class queries — Verify and the
    * correctness gate run them — but deliberately not scale-shaped:
    * m8's exact multi-countDistinct profile plans an Expand ×4 over the
    * fact table by design; m8b (one-pass HLL) is the default profiling
    * entry. `SPARK_GRAFT_BENCH_ALL=1` times them anyway.
    */
  val benchOptIn: Set[String] = Set("m8_profile")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
