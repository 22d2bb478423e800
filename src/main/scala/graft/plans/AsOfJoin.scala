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
  * Scope (deliberate): single LONG equi-key, LONG-comparable ts and
  * tiebreak (timestamps arrive as micros) — the fixture's and the common
  * telemetry shape. Generalizing to arbitrary key tuples is bookkeeping,
  * not design.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
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
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)

      var rNext: InternalRow = null          // lookahead (copied)
      var best: InternalRow = null           // latest right ≤ current left ts
      var bestKey = 0L
      def advance(): Unit =
        rNext = if (rIt.hasNext) rIt.next().copy() else null
      advance()

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
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tb) :: Nil
    case _ => Nil
  }
}

object AsOfJoinApi {
  /** `asofJoin(left, right, "key", "ts", "tiebreak")`: latest right row
    * per key at-or-before each left row's ts (left outer). Column names
    * resolve against their own side, so the two sides may share names.
    * Registers the planning strategy on first use.
    */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTiebreak: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // df(name) yields the side's resolved AttributeReference, so the
    // node is born resolved — no analyzer rule needed.
    val node = AsOfJoin(
      ColumnBridge.logicalPlan(leftDf), ColumnBridge.logicalPlan(rightDf),
      ColumnBridge.expression(leftDf(leftKey)),
      ColumnBridge.expression(rightDf(rightKey)),
      ColumnBridge.expression(leftDf(leftTs)),
      ColumnBridge.expression(rightDf(rightTs)),
      ColumnBridge.expression(rightDf(rightTiebreak)))
    ColumnBridge.ofRows(spark, node)
  }
}
