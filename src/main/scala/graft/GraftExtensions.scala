package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, NormalizeNfc, RollingHash}

/** SQL-surface registration for graft's native Catalyst expressions
  * (SURVEY.md §4.3's extension mechanism). Wire with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic, or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * after which `SELECT rolling_hash(split(text, ' ')), dot_product(a, b)`
  * work from plain SQL — the engine's functions are first-class citizens
  * of the Catalyst function registry, not DSL-only helpers.
  *
  * For sessions built WITHOUT the extension (the driver contract's
  * mains construct a plain session), [[GraftExtensions.ensureFunctions]]
  * registers the same triples into an existing session's function
  * registry idempotently — the sql7 entry attaches through it, the same
  * late-attach pattern `RangeJoinRewrite.ensureRegistered` uses for the
  * optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // bounded-interval range joins plan as bucketed equi joins by default
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // MERGE INTO over plain-parquet catalog tables: swap the resolved
    // MergeIntoTable for the copy-on-write command before CheckAnalysis
    // rejects it (v1 tables have no row-level-operation support)
    e.injectResolutionRule(_ => graft.plans.MergeIntoParquetRewrite)
    // UPDATE / DELETE over plain-parquet catalog tables: same contract
    // (strict subsets of the MERGE copy-on-write machinery)
    e.injectResolutionRule(_ => graft.plans.DmlParquetRewrite)
    // OPTIMIZE / CHECKPOINT TABLE maintenance statements (sql25):
    // a delegating pre-pass — everything Spark's grammar knows passes
    // through untouched
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    GraftExtensions.functions.foreach(e.injectFunction)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  /** The engine's SQL-callable native expressions, as the (identifier,
    * info, builder) triples both registration paths consume.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rolling_hash"),
      info("rolling_hash",
        "rolling_hash(tokens) - order-sensitive polynomial fingerprint of an ARRAY<STRING>"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)),
    (FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(a, b) - dot product of two ARRAY<DOUBLE> columns"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))),
    (FunctionIdentifier("normalize_nfc"),
      info("normalize_nfc",
        "normalize_nfc(str) - Unicode NFC normalization (tokenizer-prep)"),
      (exprs: Seq[Expression]) => NormalizeNfc(exprs.head)),
    // custom UDTF (Catalyst Generator): overlapping token windows —
    // usable from SQL via LATERAL VIEW chunk_spans(tokens, size, stride)
    (FunctionIdentifier("chunk_spans"),
      info("chunk_spans",
        "chunk_spans(tokens, size, stride) - UDTF emitting overlapping token windows as (chunk_idx, chunk) rows"),
      (exprs: Seq[Expression]) =>
        graft.functions.ChunkSpans(exprs.head, exprs(1), exprs(2))),
    // Spark ships BloomFilterMightContain for its internal runtime
    // filters but exposes no SQL name for it; register one so a
    // serialized `df.stat.bloomFilter` can prefilter from plain SQL.
    (FunctionIdentifier("might_contain"),
      info("might_contain",
        "might_contain(bloomBinary, longCol) - codegen'd bloom-filter probe"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))),
    // mergeable KLL quantile sketches (k4) — Spark ships the HLL trio
    // (hll_sketch_agg/hll_union_agg/hll_sketch_estimate) but no
    // storable quantile sketch; same surface shape here
    (FunctionIdentifier("kll_sketch_agg"),
      info("kll_sketch_agg",
        "kll_sketch_agg(doubleCol) - mergeable KLL quantile sketch (BINARY)"),
      (exprs: Seq[Expression]) => graft.functions.KllSketchAgg(exprs.head)),
    (FunctionIdentifier("kll_union_agg"),
      info("kll_union_agg",
        "kll_union_agg(sketchBinary) - union of stored KLL sketches"),
      (exprs: Seq[Expression]) => graft.functions.KllUnionAgg(exprs.head)),
    (FunctionIdentifier("kll_get_quantile"),
      info("kll_get_quantile",
        "kll_get_quantile(sketchBinary, rank) - quantile from a KLL sketch"),
      (exprs: Seq[Expression]) =>
        graft.functions.KllGetQuantile(exprs.head, exprs(1))),
    // mergeable theta distinct-count sketches with SET ALGEBRA (k5) —
    // Spark's HLL trio unions but cannot intersect/difference
    (FunctionIdentifier("theta_sketch_agg"),
      info("theta_sketch_agg",
        "theta_sketch_agg(keyCol) - mergeable theta distinct-count sketch (BINARY)"),
      (exprs: Seq[Expression]) => graft.functions.ThetaSketchAgg(exprs.head)),
    (FunctionIdentifier("theta_union_agg"),
      info("theta_union_agg",
        "theta_union_agg(sketchBinary) - union of stored theta sketches"),
      (exprs: Seq[Expression]) => graft.functions.ThetaUnionAgg(exprs.head)),
    (FunctionIdentifier("theta_estimate"),
      info("theta_estimate",
        "theta_estimate(sketchBinary) - distinct-count estimate from a theta sketch"),
      (exprs: Seq[Expression]) => graft.functions.ThetaEstimate(exprs.head)),
    (FunctionIdentifier("theta_intersect"),
      info("theta_intersect",
        "theta_intersect(a, b) - sketch of the set intersection"),
      (exprs: Seq[Expression]) =>
        graft.functions.ThetaIntersect(exprs.head, exprs(1))),
    (FunctionIdentifier("theta_a_not_b"),
      info("theta_a_not_b",
        "theta_a_not_b(a, b) - sketch of the set difference a MINUS b"),
      (exprs: Seq[Expression]) =>
        graft.functions.ThetaANotB(exprs.head, exprs(1))),
    // mergeable heavy-hitters sketches (k6) — frequency with bounds
    (FunctionIdentifier("freq_sketch_agg"),
      info("freq_sketch_agg",
        "freq_sketch_agg(longCol) - mergeable frequent-items sketch (BINARY)"),
      (exprs: Seq[Expression]) => graft.functions.FreqSketchAgg(exprs.head)),
    (FunctionIdentifier("freq_union_agg"),
      info("freq_union_agg",
        "freq_union_agg(sketchBinary) - union of stored frequent-items sketches"),
      (exprs: Seq[Expression]) => graft.functions.FreqUnionAgg(exprs.head)),
    (FunctionIdentifier("freq_top_items"),
      info("freq_top_items",
        "freq_top_items(sketchBinary, threshold) - items provably reaching threshold"),
      (exprs: Seq[Expression]) =>
        graft.functions.FreqTopItems(exprs.head, exprs(1))))

  /** Register the SQL functions into an ALREADY-BUILT session (no-op if
    * present). Session-scoped state like the temp-view registry, so the
    * cost is one registry probe per query build, not per row.
    */
  def ensureFunctions(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
