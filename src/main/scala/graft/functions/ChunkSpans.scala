package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `chunk_spans(tokens, size, stride)` — a custom Catalyst UDTF
  * (Generator): emits one row per overlapping fixed-size token window,
  * `(chunk_idx BIGINT, chunk STRING)`, the context-window prep step
  * before tokenization (SURVEY §2B F19; closes the declared UDTF
  * extension surface §2B:285-288 — F8 exercises only built-in
  * `explode`).
  *
  * Semantics match the m6 sequence+posexplode composition exactly
  * (FunctionsSpec pins the law): chunk starts at 0, stride, 2·stride, …
  * while start < len — ceil(len/stride) chunks, the last possibly
  * shorter than `size`; tokens join with a single space, null elements
  * skipped (the concat_ws rule). A NULL token array generates no rows
  * (the standard generator convention); an empty array likewise.
  *
  * Why a Generator and not the sequence+posexplode composition: the
  * composition MATERIALIZES every chunk string into an intermediate
  * array per row (a doc's full text re-copied ~size/stride ≈ 1.25×
  * into one ArrayData) before posexplode streams it out; the Generator
  * emits rows lazily with no per-row array allocation. Same plan shape
  * otherwise — one Generate over the scan, shuffle-free.
  *
  * Evaluation is interpreted (CodegenFallback): Spark's GenerateExec
  * supports codegen only for the built-in explode family; a row-lazy
  * generator in the fallback path still avoids the composition's
  * intermediate copies.
  */
case class ChunkSpans(tokens: Expression, size: Expression, stride: Expression)
  extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, size, stride)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _)
        if size.dataType == IntegerType && stride.dataType == IntegerType =>
      if (size.foldable && stride.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "chunk_spans: size and stride must be constant")
    case _ => TypeCheckResult.TypeCheckFailure(
      "chunk_spans expects (ARRAY<STRING>, INT, INT)")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val sz = size.eval(input).asInstanceOf[Int]
    val st = stride.eval(input).asInstanceOf[Int]
    if (sz <= 0 || st <= 0) throw new IllegalArgumentException(
      s"chunk_spans: size ($sz) and stride ($st) must be positive")
    val n = arr.numElements()
    val nChunks = (n + st - 1) / st // ceil(len/stride); 0 for an empty array
    (0 until nChunks).iterator.map { i =>
      val start = i * st
      val end = math.min(start + sz, n)
      val sb = new java.lang.StringBuilder
      var j = start
      var first = true
      while (j < end) {
        if (!arr.isNullAt(j)) { // concat_ws skips nulls, no separator
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      InternalRow(i.toLong, UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkSpans =
    copy(tokens = newChildren(0), size = newChildren(1), stride = newChildren(2))
}
