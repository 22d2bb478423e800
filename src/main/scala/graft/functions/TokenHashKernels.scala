package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document text-hash kernels for the dedup family
  * (`Dedup.minhashDedup`, l2b/l2b2 simhash, m5 clusters) — the same
  * one-node-expression attack as [[ShingleHash]] (see its doc for the
  * measured per-task closure-deserialization motivation).
  *
  * Round 4 computed minhash signatures as an explode + 16
  * `min(xxhash64(concat('perm<i>:', tok)))` aggregates: every token row
  * re-serialized 16 prefix-concat strings and the groupBy(doc_id) shuffled
  * the whole token explode. These kernels compute the distinct token-hash
  * set, the full minhash signature, and the simhash fingerprint per row
  * inside the scan projection — hashing each token's bytes ONCE and
  * deriving everything else with cheap `XXH64.hashLong` chains — so
  * signature construction needs NO explode, NO aggregation, and NO shuffle
  * at all. At 100 TB that removes the largest shuffle of the dedup
  * pipeline (the token explode is ~10x the document bytes).
  */
private[functions] trait TokenArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${other.catalogString}")
  }
}

/** Distinct XXH64 hashes (seed 42, Spark's `xxhash64` seed — values match
  * `xxhash64(tok)` exactly) of a token array, ascending ARRAY<BIGINT>.
  * The per-doc token SET in 8 bytes/token: feeds minhash/simhash
  * derivation and the exact jaccard verifier (`array_intersect` of two
  * sorted sets ≙ token-set intersection, modulo ~1e-16 collision odds).
  */
case class TokenHashes(child: Expression)
    extends TokenArrayExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TokenHashKernels.distinctHashes(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TokenHashKernels.distinctHashes($c));""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** MinHash signature over a distinct token-hash set (the output of
  * [[TokenHashes]]): ARRAY<BIGINT> of `numPerm` minima, permutation i
  * being `xxh64(tokHash, seed=i)`. Empty input → all Long.MaxValue (empty
  * docs share one signature and are never verified ≥ threshold).
  */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TokenHashKernels.minhash(input.asInstanceOf[ArrayData], numPerm))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TokenHashKernels.minhash($c, $numPerm));""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash over a distinct token-hash set: bit j of the result is
  * set iff more token hashes have bit j set than clear — identical values
  * to the round-3 explode + 64-conditional-sums formulation (same hash,
  * same votes, same >0 tie rule), in one pass with no aggregation.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TokenHashKernels.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenHashKernels.simhash($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Exact set-intersection SIZE of two ARRAY<BIGINT> hash sets — the
  * dedup family's verify primitive. Replaces `size(array_intersect(a,b))`
  * on the hot pair-verify path: `ArrayIntersect` allocates a hash set
  * per ROW (boxed for the generic path) and, because the comparison is
  * written into a join condition as `inter / (n1+n2-inter) >= t`, the
  * whole intersect is evaluated TWICE per candidate pair (Catalyst does
  * not CSE inside join conditions). This kernel copies both sides to
  * primitive long arrays, sorts only if not already ascending (the
  * [[TokenHashes]]/[[ShingleHash]] outputs are pre-sorted; df-ordered
  * `kept` arrays pay one ~128-element sort), and two-pointer-merges —
  * zero boxing, zero hash set, one evaluation producing the count that
  * both sides of the threshold inequality reuse.
  *
  * Set semantics: inputs are DISTINCT by construction everywhere this is
  * used (they are set encodings); on multiset inputs this counts
  * min-multiplicity matches where `array_intersect` would count distinct.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"intersect_count expects two ARRAY<BIGINT>, got $other")
    }
  override def nullSafeEval(l: Any, r: Any): Any =
    TokenHashKernels.intersectCount(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TokenHashKernels.intersectCount($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object TokenHashKernels {

  private final val Seed = 42L // Spark's xxhash64 default seed

  /** |a ∩ b| of two long-array sets; see [[IntersectCount]]. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val x = a.toLongArray(); val y = b.toLongArray()
    sortIfNeeded(x); sortIfNeeded(y)
    var i = 0; var j = 0; var c = 0
    while (i < x.length && j < y.length) {
      val xi = x(i); val yj = y(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  private def sortIfNeeded(x: Array[Long]): Unit = {
    var i = 1
    while (i < x.length && x(i - 1) <= x(i)) i += 1
    if (i < x.length) java.util.Arrays.sort(x)
  }

  /** Column form of [[IntersectCount]]. */
  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sorted distinct XXH64(seed 42) hashes of the tokens. */
  def distinctHashes(toks: ArrayData): Array[Long] = {
    val n = toks.numElements()
    if (n == 0) return Array.emptyLongArray
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) =
        if (toks.isNullAt(i)) XXH64.hashLong(0L, Seed)
        else {
          val s: UTF8String = toks.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
        }
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == n) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** numPerm minima of xxh64(h, seed=perm) over the hash set. */
  def minhash(hashes: ArrayData, numPerm: Int): Array[Long] = {
    val sig = new Array[Long](numPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var p = 0
      while (p < numPerm) {
        val ph = XXH64.hashLong(h, p)
        if (ph < sig(p)) sig(p) = ph
        p += 1
      }
      i += 1
    }
    sig
  }

  /** Majority-vote 64-bit simhash; bit set iff vote sum > 0. */
  def simhash(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        votes(j) += (((h >>> j) & 1L) * 2 - 1).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column forms. */
  def tokenHashes(tokens: Column): Column =
    ColumnBridge.column(TokenHashes(ColumnBridge.expression(tokens)))
  def minhashSig(tokenHashes: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokenHashes), numPerm))
  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))
}
