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
