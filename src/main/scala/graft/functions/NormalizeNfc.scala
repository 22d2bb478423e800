package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string —
  * the tokenizer-prep primitive every multilingual corpus needs before
  * hashing/dedup (the same logical text arrives from the web in composed
  * AND decomposed forms: 'é' vs 'e'+U+0301 hash differently but ARE the
  * same document). Spark ships no normalization builtin; a Scala UDF
  * would box every row — this is the SURVEY §2B preference order again:
  * native Expression > udf().
  *
  * Fast path: java.text.Normalizer.isNormalized is a cheap scan that is
  * true for virtually all real web text (pure ASCII short-circuits
  * immediately), so the common row pays one scan and ZERO allocation;
  * only genuinely decomposed rows pay the normalize+re-encode. Codegen
  * participates in whole-stage codegen via a static helper call —
  * the decode/normalize logic is not worth inlining as Java source, the
  * call target is JIT-monomorphic.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_nfc expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeNfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfc.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Static helper shared by eval and codegen. Pure-ASCII input (the
    * overwhelming web-text case) returns the INPUT object after one
    * byte scan — zero allocation; non-ASCII input pays one String
    * decode for the isNormalized check, and only genuinely decomposed
    * rows pay the normalize+re-encode.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return s // ASCII is closed under NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column form: NFC-normalize a STRING column. */
  def normalizeNfc(c: Column): Column =
    ColumnBridge.column(NormalizeNfc(ColumnBridge.expression(c)))
}
