package graft.functions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable HEAVY-HITTERS sketches (DataSketches frequent-items /
  * Misra-Gries-family LongsSketch) — the "which keys are hot" primitive
  * a 100 TB pipeline needs BEFORE it commits to a plan: hot join keys
  * for salting decisions, hot users for partition sizing, hot shingles
  * for dedup banding — all answerable from small persistable BINARY
  * summaries built in one pass and MERGED across days/partitions,
  * never by an exact corpus-wide groupBy. Completes the sketch family:
  * k1 bloom (membership), k2 count-min (point frequency), k3 HLL
  * (distinct), k4 KLL (quantiles), k5 theta (set algebra), k6 this
  * (top-k frequency with error bounds).
  *
  * Same native posture as KLL/theta: the aggregation buffer IS the
  * sketch object, serialized only at shuffle boundaries; partial
  * aggregation collapses map-side. Guarantee: with map size m, every
  * estimate is within N·(3.5/m) of truth (Anderson et al. 2017 /
  * datasketches a-priori error), and NO_FALSE_POSITIVES extraction
  * returns only items whose LOWER bound clears the threshold. Below m
  * active keys the sketch never purges — estimates are EXACT, which is
  * what makes the k6 entry hash-checkable against DuckDB's exact
  * GROUP BY/HAVING at fixture scale; SketchSpec owns the purge-regime
  * error-bound law.
  */
object FreqOps {
  private[functions] def toBytes(sk: LongsSketch): Array[Byte] = sk.toByteArray
  private[functions] def fromBytes(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))
}

/** `freq_sketch_agg(longCol[, maxMapSize])` — build a frequent-items
  * sketch over a LONG key column. Result is a storable BINARY.
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg expects BIGINT/INT, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "freq_sketch_agg"

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buffer.update(l.longValue())
      case i: java.lang.Integer => buffer.update(i.longValue())
      case _ => ()
    }
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = FreqOps.toBytes(buffer)

  override def serialize(buffer: LongsSketch): Array[Byte] = FreqOps.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    FreqOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** `freq_union_agg(sketchBinary)` — merge stored frequent-items
  * sketches (the rollup side).
  */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_union_agg expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "freq_union_agg"

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(FreqOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    else buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = FreqOps.toBytes(buffer)

  override def serialize(buffer: LongsSketch): Array[Byte] = FreqOps.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    FreqOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqUnionAgg =
    copy(child = newChild)
}

/** `freq_top_items(sketchBinary, threshold)` — items whose frequency
  * provably reaches `threshold` (NO_FALSE_POSITIVES: lower bound ≥
  * threshold; in the never-purged regime this is the exact HAVING
  * count ≥ threshold set), as ARRAY<STRUCT<item, n>>. Post-aggregate
  * rows only.
  */
case class FreqTopItems(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_top_items expects (BINARY, BIGINT), got $other")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType), StructField("n", LongType))))
  override def prettyName: String = "freq_top_items"

  override protected def nullSafeEval(bytes: Any, thr: Any): Any = {
    val rows = FreqOps.fromBytes(bytes.asInstanceOf[Array[Byte]])
      .getFrequentItems(thr.asInstanceOf[Long], ErrorType.NO_FALSE_POSITIVES)
    new GenericArrayData(rows.map(r =>
      InternalRow(r.getItem, r.getEstimate): Any))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqTopItems =
    copy(left = newLeft, right = newRight)
}
