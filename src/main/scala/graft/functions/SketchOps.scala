package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column-level sketch probes.
  *
  * The bloom probe reuses Spark's own codegen'd
  * `BloomFilterMightContain` expression (the one Catalyst injects for
  * runtime row-level filtering) instead of a Scala UDF: the serialized
  * filter rides along as a foldable binary literal in the task binary —
  * no broadcast bookkeeping — and the probe stays inside whole-stage
  * codegen, so a 100 TB fact scan keeps its fused pipeline.
  */
object SketchOps {

  /** `might_contain(bloom, longCol)` over a pre-built
    * [[org.apache.spark.util.sketch.BloomFilter]] (the `df.stat
    * .bloomFilter` product — both sides use the same xxhash-based
    * `mightContainLong`, so semantics are identical to probing the
    * sketch object directly).
    */
  def bloomMightContain(bloom: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      ColumnBridge.expression(value)))
  }

  /** Mergeable KLL quantile sketch of a DOUBLE column (k4; see
    * [[graft.functions.KllSketchAgg]]). Result is a storable BINARY.
    */
  def kllSketchAgg(value: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(value), k).toAggregateExpression())

  /** Union of stored KLL sketch binaries. */
  def kllUnionAgg(sketch: Column): Column =
    ColumnBridge.column(
      KllUnionAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  /** Quantile at `rank` ∈ [0,1] from a stored/merged KLL sketch. */
  def kllQuantile(sketch: Column, rank: Double): Column =
    ColumnBridge.column(KllGetQuantile(ColumnBridge.expression(sketch),
      Literal(rank, org.apache.spark.sql.types.DoubleType)))

  /** Mergeable theta distinct-count sketch of a LONG/INT/STRING key
    * column (k5; see [[graft.functions.ThetaSketchAgg]]). Result is a
    * storable BINARY that supports union, intersection, and difference.
    */
  def thetaSketchAgg(value: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(value), lgK).toAggregateExpression())

  /** Union of stored theta sketch binaries. */
  def thetaUnionAgg(sketch: Column): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  /** Distinct-count estimate from a stored/merged theta sketch. */
  def thetaEstimate(sketch: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sketch)))

  /** Sketch of the intersection of two theta sketches. */
  def thetaIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sketch of the difference a \ b of two theta sketches. */
  def thetaANotB(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaANotB(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Mergeable frequent-items sketch of a LONG key column (k6; see
    * [[graft.functions.FreqSketchAgg]]). Result is a storable BINARY.
    */
  def freqSketchAgg(value: Column, maxMapSize: Int = 1024): Column =
    ColumnBridge.column(FreqSketchAgg(
      ColumnBridge.expression(value), maxMapSize).toAggregateExpression())

  /** Union of stored frequent-items sketch binaries. */
  def freqUnionAgg(sketch: Column): Column =
    ColumnBridge.column(
      FreqUnionAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  /** Items provably reaching `threshold`, as ARRAY<STRUCT<item, n>>. */
  def freqTopItems(sketch: Column, threshold: Column): Column =
    ColumnBridge.column(FreqTopItems(
      ColumnBridge.expression(sketch), ColumnBridge.expression(threshold)))
}
