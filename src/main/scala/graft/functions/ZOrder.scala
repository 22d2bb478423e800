package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two BIGINT keys — the multi-dimension
  * clustering key behind `OPTIMIZE … ZORDER BY (a, b)`.
  *
  * Linear clustering (sort by `a`, then `b`) gives perfect data-skipping
  * on `a` and none on `b`; interleaving the keys' bits makes file/row-
  * group min-max ranges tight on BOTH dimensions at once, so a 100 TB
  * table clustered by `zorder(user, day)` prunes on either predicate.
  * This is the standard bit-spread construction (Morton 1966; the
  * magic-mask spread is public-domain bit-twiddling, cf. Bit Twiddling
  * Hacks): each input is masked to its low 31 bits, spread so bit i
  * lands at bit 2i, and the two spreads interleave into one
  * non-negative BIGINT whose integer order IS the Z-curve order —
  * sortable by both engines with plain `ORDER BY`, no custom
  * comparator.
  *
  * Five shift-mask rounds per input, fully codegen'd (`doGenCode`), so
  * the key computes inside whole-stage codegen during the compaction
  * shuffle's map side — no UDF, no allocation. The DuckDB oracle
  * mirrors the identical shift-mask pipeline in SQL (f23), pinning the
  * construction bit-for-bit.
  */
case class ZOrderLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder expects (BIGINT, BIGINT), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      (ZOrderLong.spread(a.asInstanceOf[Long]) << 1) |
        ZOrderLong.spread(b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrderLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = ($cls.spread($a) << 1) | $cls.spread($b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderLong =
    copy(left = newLeft, right = newRight)
}

object ZOrderLong {

  /** Spread the low 31 bits of `x` so bit i lands at bit 2i; the
    * 31-bit mask keeps the final interleave non-negative (bit 61 is
    * the highest set), so BIGINT order equals Z-curve order in any
    * two's-complement engine. Called from generated code — keep the
    * signature JVM-stable.
    */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Column surface: `zorder(a, b)` over two BIGINT columns. */
  def zorder(a: Column, b: Column): Column =
    ColumnBridge.column(
      ZOrderLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** N-lane Morton interleave — `OPTIMIZE … ZORDER BY (a, b, c, …)` for
  * more than two clustering dimensions. Each of the n lanes keeps its
  * low ⌊62/n⌋ bits (3 lanes → 20 bits, 4 → 15 …); bit i of lane j
  * lands at bit i·n + (n−1−j), so lane order is significance order and
  * the n=2 case is bit-identical to [[ZOrderLong]]'s shift-mask
  * construction (ZOrderSpec pins the equivalence). The magic-mask
  * spread only exists for the dyadic case, so this one is a plain
  * bits×lanes loop — still a tight branch-free kernel per row, still
  * inside whole-stage codegen via `doGenCode`. The resolution trade is
  * real and documented: every added dimension costs lane bits, which
  * is why the 2-lane specialization stays the default and wider keys
  * are an explicit choice.
  */
case class ZOrderN(children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
    extends org.apache.spark.sql.catalyst.expressions.Expression {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper

  private def n: Int = children.size
  /** Bits kept per lane; 62/n keeps the interleave non-negative. */
  def bitsPerLane: Int = 62 / n

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 2 || n > 6)
      TypeCheckResult.TypeCheckFailure(
        s"zorder_n takes 2 to 6 BIGINT lanes, got $n — beyond 6 each " +
          "lane keeps <10 bits and the key stops discriminating")
    else children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"zorder_n expects BIGINT lanes, got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](n)
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      vals(j) = v.asInstanceOf[Long]
      j += 1
    }
    java.lang.Long.valueOf(ZOrderN.interleave(vals, bitsPerLane))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
    val evals = children.map(_.genCode(ctx))
    val lanes = ctx.freshName("zLanes")
    val valueVar = ctx.freshName("zValue")
    val cls = ZOrderN.getClass.getName.stripSuffix("$") + "$.MODULE$"
    if (nullable) {
      val isNullVar = ctx.freshName("zIsNull")
      val fill = evals.zipWithIndex.map { case (e, i) =>
        s"""
           |${e.code}
           |if (!$isNullVar) {
           |  if (${e.isNull}) { $isNullVar = true; }
           |  else { $lanes[$i] = ${e.value}; }
           |}
           |""".stripMargin
      }.mkString
      val body =
        s"""
           |boolean $isNullVar = false;
           |long $valueVar = -1L;
           |long[] $lanes = new long[$n];
           |$fill
           |if (!$isNullVar) {
           |  $valueVar = $cls.interleave($lanes, $bitsPerLane);
           |}
           |""".stripMargin
      ExprCode(code = code"$body",
        isNull = JavaCode.isNullVariable(isNullVar),
        value = JavaCode.variable(valueVar, LongType))
    } else {
      val fill = evals.zipWithIndex.map { case (e, i) =>
        s"""
           |${e.code}
           |$lanes[$i] = ${e.value};
           |""".stripMargin
      }.mkString
      val body =
        s"""
           |long[] $lanes = new long[$n];
           |$fill
           |long $valueVar = $cls.interleave($lanes, $bitsPerLane);
           |""".stripMargin
      ExprCode(code = code"$body",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
        value = JavaCode.variable(valueVar, LongType))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderN = copy(children = newChildren)
}

object ZOrderN {

  /** Interleave the low `bits` bits of each lane; lane 0 most
    * significant within each bit group. Called from generated code.
    */
  def interleave(vals: Array[Long], bits: Int): Long = {
    val n = vals.length
    var z = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        z |= (((vals(j) >> i) & 1L)) << (i * n + (n - 1 - j))
        j += 1
      }
      i += 1
    }
    z
  }

  /** Column surface: `zorderN(a, b, c, …)` over 2–6 BIGINT columns. */
  def zorderN(cols: Column*): Column =
    ColumnBridge.column(ZOrderN(cols.map(ColumnBridge.expression)))
}
