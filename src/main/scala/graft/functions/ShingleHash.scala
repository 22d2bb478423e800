package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT word-3-gram shingle hashes of
  * a token array, as ARRAY<BIGINT> — the candidate-blocking primitive of
  * the exact jaccard join (`Dedup.shingleJaccardTopK`).
  *
  * Replaces a ~50-node higher-order-function tree
  * (`CASE WHEN … transform(sequence(…), concat_ws(element_at×3)) …
  * array_distinct` + a downstream `xxhash64` projection) with one node:
  *
  *  - eval is a primitive loop — each token's UTF-8 bytes are XXH64-hashed
  *    once, each 3-gram combines three token hashes by seed-chaining
  *    (`xxh64(h1 ← xxh64(h2 ← xxh64(h3, seed)))`), dedupe is
  *    sort-and-compact on a long[]. No per-element boxing, no interpreted
  *    lambda, no intermediate concat string (the old form re-hashed every
  *    token ~3×, once per overlapping window).
  *  - the plan tree shrinks accordingly: in local profiling the dominant
  *    fixed cost of this query's stages was per-TASK deserialization of
  *    the big interpreted expression tree (~150-300 ms/task across 32
  *    tasks), not data — a one-node expression attacks exactly that.
  *
  * Distinctness matches the string form: tokens come from
  * `split(text, ' ')` so they contain no separator, making the
  * (t1,t2,t3) ↦ "t1 t2 t3" encoding injective; the hashed variant differs
  * only on 64-bit chain collisions (~1e-16 per document at 100 shingles).
  * Output order is canonical (ascending) so the expression is
  * deterministic; downstream consumers re-order by (df, hash) anyway.
  */
case class ShingleHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[ArrayData])

  // Codegen calls the same static kernel — keeps the consuming projection
  // inside whole-stage codegen with no boxing at the call boundary.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** Native Catalyst expression: ALL k-token n-gram chain hashes of a token
  * array, in document order, as ARRAY<BIGINT> — the per-position passage
  * fingerprint behind duplicate-passage detection (`l14_dup_passage`).
  *
  * Differs from [[ShingleHash]] on exactly the two axes that operator
  * needs: the window length is a parameter (not fixed at 3), and every
  * OCCURRENCE is kept in order (no sort, no dedup) so downstream stages
  * can count repeated positions — a gram repeated inside one document is
  * still a duplicated passage. Same seed-chained XXH64 kernel, same
  * injectivity argument (tokens are separator-free), same codegen shape.
  */
case class NGramHash(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash.computeNGrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash.computeNGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramHash =
    copy(child = newChild)
}

object ShingleHash {

  private final val Seed = 42L

  /** All k-gram chain hashes, one per window position, document order. */
  def computeNGrams(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (toks.isNullAt(i)) XXH64.hashLong(0L, Seed)
        else {
          val s: UTF8String = toks.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
        }
      i += 1
    }
    val hs = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var acc = Seed
      var j = i + k - 1
      while (j >= i) { acc = XXH64.hashLong(th(j), acc); j -= 1 }
      hs(i) = acc
      i += 1
    }
    new GenericArrayData(hs)
  }

  /** Column form: all k-gram hashes (every occurrence, document order). */
  def ngramHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(NGramHash(ColumnBridge.expression(tokens), k))

  /** Distinct chained-XXH64 hashes of all 3-token windows, ascending. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (toks.isNullAt(i)) XXH64.hashLong(0L, Seed)
        else {
          val s: UTF8String = toks.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
        }
      i += 1
    }
    val hs = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      hs(i) = XXH64.hashLong(th(i), XXH64.hashLong(th(i + 1), XXH64.hashLong(th(i + 2), Seed)))
      i += 1
    }
    java.util.Arrays.sort(hs)
    // compact duplicates in place
    var w = 1
    i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Column form: distinct 3-gram shingle hashes of an ARRAY<STRING>. */
  def shingleHashes(tokens: Column): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(tokens)))
}
