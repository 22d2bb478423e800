package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: order-sensitive polynomial rolling hash of
  * a token array — the document-fingerprinting primitive (builder-prompt
  * text-analysis inventory). Two identical token sequences hash equal;
  * any reorder/edit changes the fingerprint.
  *
  * h = fold(tokens)( h*31 + tokenHash ) mod 1e9+7, with
  * tokenHash = fold(utf8 bytes)( th*131 + byte ) mod 1e9+7.
  *
  * Implemented with `doGenCode` so it participates in whole-stage codegen
  * (no UDF boundary, no boxing in the hot loop) — the preference order
  * from SURVEY §2B's UDF summary: native Expression > udf().
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  private val Mod = 1000000007L

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var h = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var th = 0L
        var j = 0
        while (j < bytes.length) {
          th = (th * 131 + (bytes(j) & 0xff)) % Mod
          j += 1
        }
        h = (h * 31 + th) % Mod
      }
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long graftH = 0L;
         |for (int graftI = 0; graftI < $c.numElements(); graftI++) {
         |  if (!$c.isNullAt(graftI)) {
         |    byte[] graftBs = $c.getUTF8String(graftI).getBytes();
         |    long graftTh = 0L;
         |    for (int graftJ = 0; graftJ < graftBs.length; graftJ++) {
         |      graftTh = (graftTh * 131L + (graftBs[graftJ] & 0xff)) % ${Mod}L;
         |    }
         |    graftH = (graftH * 31L + graftTh) % ${Mod}L;
         |  }
         |}
         |${ev.value} = graftH;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column form: fingerprint of an ARRAY<STRING> token column. */
  def rollingHash(tokens: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(tokens)))
}
