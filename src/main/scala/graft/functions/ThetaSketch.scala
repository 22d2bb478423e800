package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable DISTINCT-COUNT sketches with SET ALGEBRA (DataSketches
  * Theta) — the capability HLL (k3) fundamentally lacks: HLL unions,
  * but cannot intersect or difference, so "how many users did BOTH X
  * and Y" over stored per-segment summaries needs Theta's KMV-style
  * sample of the key space (Dasgupta et al., "Theta-Sketch Framework",
  * 2016). Per-(segment, day) sketches are small persistable BINARY
  * values; any later overlap/exclusive-reach question is answered by
  * union/intersect/a-not-b over the stored sketches, never by
  * rescanning the fact data.
  *
  * Same native posture as the KLL pair ([[KllSketchAgg]]): the
  * aggregation buffer is the DataSketches Union object itself,
  * serialized (as an ordered compact sketch — the canonical
  * interchange form, which re-seeds a fresh Union losslessly: a
  * union's state IS a theta sketch) only at shuffle boundaries;
  * partial aggregation collapses map-side, so the shuffle carries one
  * ~KB sketch per group per partition at any scale.
  *
  * Determinism: theta updates are pure hashing (murmur3 under the
  * DataSketches default seed) with no RNG, so sketches — and their
  * estimates — are bit-stable across runs and partitionings (union
  * order cannot change the retained set at a given theta). Below the
  * nominal-entries cap the sketch is in EXACT mode and every estimate
  * equals the true count — which is what makes k5 hash-checkable
  * against DuckDB's exact distinct joins at fixture scale while the
  * same plan degrades gracefully to ±1.6% (lgK=12) bounds at 100 TB;
  * SketchSpec owns the estimation-mode error-bound law.
  */
object ThetaOps {
  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  private[functions] def toBytes(u: Union): Array[Byte] =
    u.getResult(true, null).toByteArray

  private[functions] def fromBytes(lgK: Int, bytes: Array[Byte]): Union = {
    val u = newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  private[functions] def heap(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))
}

/** `theta_sketch_agg(col[, lgK])` — build a theta sketch over a LONG,
  * INT, or STRING key column. Result is a storable/unionable BINARY.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects BIGINT/INT/STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union = ThetaOps.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buffer.update(l.longValue())
      case i: java.lang.Integer => buffer.update(i.longValue())
      case s => buffer.update(s.toString)
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult(false, null))
    buffer
  }

  override def eval(buffer: Union): Any = ThetaOps.toBytes(buffer)

  override def serialize(buffer: Union): Array[Byte] = ThetaOps.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Union =
    ThetaOps.fromBytes(lgK, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg(sketchBinary)` — union of stored theta sketches
  * (the rollup-merge side).
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union = ThetaOps.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult(false, null))
    buffer
  }

  override def eval(buffer: Union): Any = ThetaOps.toBytes(buffer)

  override def serialize(buffer: Union): Array[Byte] = ThetaOps.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Union =
    ThetaOps.fromBytes(lgK, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `theta_estimate(sketchBinary)` — distinct-count estimate from a
  * stored sketch. Post-aggregate rows only, so CodegenFallback costs
  * nothing measurable.
  */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override protected def nullSafeEval(bytes: Any): Any =
    ThetaOps.heap(bytes.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect(a, b)` — sketch of the set intersection. */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect expects (BINARY, BINARY), got $other")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaOps.heap(a.asInstanceOf[Array[Byte]]),
        ThetaOps.heap(b.asInstanceOf[Array[Byte]]))
      .toByteArray

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** `theta_a_not_b(a, b)` — sketch of the set difference a \ b. */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_a_not_b expects (BINARY, BINARY), got $other")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_a_not_b"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaOps.heap(a.asInstanceOf[Array[Byte]]),
        ThetaOps.heap(b.asInstanceOf[Array[Byte]]))
      .toByteArray

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotB =
    copy(left = newLeft, right = newRight)
}
