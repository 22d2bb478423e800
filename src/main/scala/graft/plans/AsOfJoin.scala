package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** As-of join as a first-class operator (SURVEY.md §2B J9 / §4.3's
  * "custom SparkStrategy" trigger): for each left row, the single right
  * row of the same key with the greatest (ts, tiebreak) ≤ the left ts;
  * left outer semantics.
  *
  * The composed formulation (equi-join on key + ts filter + window
  * rank=1, see Joins.j9) shuffles the joined pairs a second time for the
  * window and materializes every candidate pair. This operator needs ONE
  * clustered exchange per side and a per-partition sorted merge: the
  * right pointer advances monotonically, state is one buffered row —
  * O(left + right) time, O(1) memory per partition, no pair blow-up.
  * That is the plan shape that survives 100 TB event tables.
  *
  * Keys: any number of columns of any orderable types (compared with
  * Catalyst's natural ascending ordering over the key projection; a
  * single LONG key short-circuits to a primitive comparison — the
  * telemetry fast path). Timestamps and the tiebreak remain
  * LONG-comparable (micros), the shape Spark itself gives
  * TimestampType. Note the merge matches on ordering-equality, so an
  * all-null key equals an all-null key (IS NOT DISTINCT FROM semantics)
  * — same behavior as Spark's SortMergeJoin ordering would give inside
  * one partition; filter nulls upstream for strict equi-join semantics.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Expression)
  extends BinaryNode {

  // right side is nullable (left outer)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
    ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTs, Ascending), SortOrder(rightTiebreak, Ascending)))

  /** Single-LONG-key fast path: primitive comparisons, no key projection
    * or row copies in the merge loop.
    */
  private def isSingleLongKey: Boolean =
    leftKeys.size == 1 && rightKeys.size == 1 &&
      leftKeys.head.dataType == org.apache.spark.sql.types.LongType &&
      rightKeys.head.dataType == org.apache.spark.sql.types.LongType

  /** Memory posture (VERDICT r9 next #8): the streamed merge holds
    * O(1) live rows per partition regardless of partition size — one
    * copied lookahead (`rNext`) plus the current best match
    * (`best`/`bestKey`, a reference to an already-copied lookahead).
    * It registers NO task-memory consumer (no map, no buffer, no
    * sorter), so the operator itself cannot OOM by construction even
    * on a pathological all-one-key partition; any memory/spill story
    * belongs to the SortExecs the planner feeds it with.
    * AsOfJoinSpec pins this mechanically: peakExecutionMemory of the
    * merge stage is 0 at two input sizes 16× apart.
    */
  override protected def doExecute(): RDD[InternalRow] = {
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    val singleLong = isSingleLongKey
    val lKeysB = leftKeys.map(BindReferences.bindReference(_, left.output))
    val rKeysB = rightKeys.map(BindReferences.bindReference(_, right.output))
    val keyTypes = leftKeys.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)

      var rNext: InternalRow = null          // lookahead (copied)
      def advance(): Unit =
        rNext = if (rIt.hasNext) rIt.next().copy() else null
      advance()

      if (singleLong) {
        val lKeyB = lKeysB.head
        val rKeyB = rKeysB.head
        var best: InternalRow = null         // latest right ≤ current left ts
        var bestKey = 0L
        lIt.map { lRow =>
          val lk = lKeyB.eval(lRow).asInstanceOf[Long]
          val lts = lTsB.eval(lRow).asInstanceOf[Long]
          // consume right rows with key < lk, or key == lk and ts <= lts;
          // the last one with key == lk is the as-of match candidate
          var continue = rNext != null
          while (continue) {
            val rk = rKeyB.eval(rNext).asInstanceOf[Long]
            if (rk < lk || (rk == lk && rTsB.eval(rNext).asInstanceOf[Long] <= lts)) {
              if (rk == lk) { best = rNext; bestKey = rk }
              advance()
              continue = rNext != null
            } else continue = false
          }
          val matched = best != null && bestKey == lk
          proj(joined(lRow, if (matched) best else nullRight))
        }
      } else {
        // general path: project each side's key tuple to an UnsafeRow and
        // compare with the natural ascending ordering over the key types
        val lKeyProj = UnsafeProjection.create(lKeysB)
        val rKeyProj = UnsafeProjection.create(rKeysB)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        var best: InternalRow = null
        var bestKey: InternalRow = null      // copied (projections reuse buffers)
        lIt.map { lRow =>
          val lk = lKeyProj(lRow)
          val lts = lTsB.eval(lRow).asInstanceOf[Long]
          var continue = rNext != null
          while (continue) {
            val cmp = keyOrd.compare(rKeyProj(rNext), lk)
            if (cmp < 0 ||
                (cmp == 0 && rTsB.eval(rNext).asInstanceOf[Long] <= lts)) {
              if (cmp == 0) { best = rNext; bestKey = rKeyProj(rNext).copy() }
              advance()
              continue = rNext != null
            } else continue = false
          }
          val matched = best != null && keyOrd.compare(bestKey, lk) == 0
          proj(joined(lRow, if (matched) best else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lks, rks, lts, rts, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lks, rks, lts, rts, tb) :: Nil
    case _ => Nil
  }
}

object AsOfJoinApi {
  /** `asofJoin(left, right, Seq("k1","k2"), …)`: latest right row per
    * key tuple at-or-before each left row's ts (left outer). Column
    * names resolve against their own side, so the two sides may share
    * names. Registers the planning strategy on first use.
    */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String,
      rightTiebreak: String): DataFrame = {
    require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
      s"as-of key lists must be non-empty and equal-length, " +
        s"got ${leftKeys.size} vs ${rightKeys.size}")
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // df(name) yields the side's resolved AttributeReference, so the
    // node is born resolved — no analyzer rule needed.
    val node = AsOfJoin(
      ColumnBridge.logicalPlan(leftDf), ColumnBridge.logicalPlan(rightDf),
      leftKeys.map(k => ColumnBridge.expression(leftDf(k))),
      rightKeys.map(k => ColumnBridge.expression(rightDf(k))),
      ColumnBridge.expression(leftDf(leftTs)),
      ColumnBridge.expression(rightDf(rightTs)),
      ColumnBridge.expression(rightDf(rightTiebreak)))
    ColumnBridge.ofRows(spark, node)
  }

  /** Single-key convenience (the common telemetry shape). */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTiebreak: String): DataFrame =
    asofJoin(leftDf, rightDf, Seq(leftKey), Seq(rightKey),
      leftTs, rightTs, rightTiebreak)
}
