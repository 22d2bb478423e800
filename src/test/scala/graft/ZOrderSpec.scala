package graft

import graft.functions.ZOrderLong
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the Morton (Z-order) interleave expression (f23/m40b, r17)
  * that the oracle hash cannot see: the spread is invertible on 31-bit
  * inputs (the key is lossless), the interleave equals a naive
  * bit-by-bit reference, codegen and interpreted evaluation agree, and
  * nulls propagate.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  private def unspread(x0: Long): Long = {
    var x = x0 & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** Naive reference: place bit i of a at 2i+1 and bit i of b at 2i. */
  private def naiveMorton(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
    }
    z
  }

  private val rng = new scala.util.Random(41)
  private val cases: Seq[(Long, Long)] =
    Seq((0L, 0L), (1L, 0L), (0L, 1L), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (0x7FFFFFFFL, 0L), (123456789L, 987654321L)) ++
      Seq.fill(200)((rng.nextLong().abs & 0x7FFFFFFFL,
        rng.nextLong().abs & 0x7FFFFFFFL))

  test("interleave equals the naive bit-by-bit reference; result is " +
      "always non-negative") {
    cases.foreach { case (a, b) =>
      val z = (ZOrderLong.spread(a) << 1) | ZOrderLong.spread(b)
      assert(z === naiveMorton(a, b), s"($a, $b)")
      assert(z >= 0L)
    }
  }

  test("the key is lossless: unspread inverts both lanes") {
    cases.foreach { case (a, b) =>
      val z = (ZOrderLong.spread(a) << 1) | ZOrderLong.spread(b)
      assert(unspread(z >> 1) === a)
      assert(unspread(z) === b)
    }
  }

  test("inputs beyond 31 bits fold through the mask (documented domain)") {
    val big = 0xABCDEF0123456789L
    assert(ZOrderLong.spread(big) === ZOrderLong.spread(big & 0x7FFFFFFFL))
  }

  test("codegen evaluation over a DataFrame matches the interpreted path " +
      "and propagates nulls") {
    import spark.implicits._
    val df = (cases.map { case (a, b) =>
      (java.lang.Long.valueOf(a), java.lang.Long.valueOf(b)) } :+
      ((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(7L))) :+
      ((java.lang.Long.valueOf(7L), null.asInstanceOf[java.lang.Long])))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
      ZOrderLong.zorder(col("a"), col("b")).as("z")).collect()
    got.foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) assert(r.isNullAt(2))
      else assert(r.getLong(2) === naiveMorton(r.getLong(0), r.getLong(1)))
    }
  }

  test("ZOrderN at n=2 is bit-identical to the dyadic shift-mask " +
      "construction") {
    import graft.functions.ZOrderN
    cases.foreach { case (a, b) =>
      assert(ZOrderN.interleave(Array(a, b), 31) ===
        ((ZOrderLong.spread(a) << 1) | ZOrderLong.spread(b)), s"($a, $b)")
    }
  }

  test("ZOrderN at n=3 matches a naive reference, stays non-negative, " +
      "and evaluates identically through codegen with null propagation") {
    import graft.functions.ZOrderN
    def naive3(a: Long, b: Long, c: Long): Long = {
      var z = 0L
      for (i <- 0 until 20) {
        z |= ((a >> i) & 1L) << (3 * i + 2)
        z |= ((b >> i) & 1L) << (3 * i + 1)
        z |= ((c >> i) & 1L) << (3 * i)
      }
      z
    }
    val m = 0xFFFFFL
    val triples = Seq((0L, 0L, 0L), (m, m, m), (3L, 5L, 9L)) ++
      Seq.fill(100)((rng.nextLong().abs & m, rng.nextLong().abs & m,
        rng.nextLong().abs & m))
    triples.foreach { case (a, b, c) =>
      val z = ZOrderN.interleave(Array(a, b, c), 20)
      assert(z === naive3(a, b, c) && z >= 0L, s"($a, $b, $c)")
    }
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (triples.map { case (a, b, c) =>
      (java.lang.Long.valueOf(a), java.lang.Long.valueOf(b),
        java.lang.Long.valueOf(c)) } :+
      ((java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long],
        java.lang.Long.valueOf(2L)))).toDF("a", "b", "c")
    df.select(col("a"), col("b"), col("c"),
      ZOrderN.zorderN(col("a"), col("b"), col("c")).as("z"))
      .collect().foreach { r =>
        if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))
          assert(r.isNullAt(3))
        else assert(r.getLong(3) === naive3(r.getLong(0), r.getLong(1), r.getLong(2)))
      }
    // arity and type guards reject loudly at analysis
    intercept[Exception](df.select(ZOrderN.zorderN(
      col("a"), col("b"), col("c"), col("a"), col("b"), col("c"),
      col("a"))).collect())
  }

  test("Z-curve locality: the max key of a 2-D quadrant stays below the " +
      "min key of the next quadrant level (order maps to space)") {
    // quadrants of the 2-bit plane: all (a,b) in [0,2)x[0,2) sort
    // before any (a,b) in [2,4)x[2,4) — the defining Z-curve property
    val q0 = for (a <- 0L to 1L; b <- 0L to 1L)
      yield (ZOrderLong.spread(a) << 1) | ZOrderLong.spread(b)
    val q3 = for (a <- 2L to 3L; b <- 2L to 3L)
      yield (ZOrderLong.spread(a) << 1) | ZOrderLong.spread(b)
    assert(q0.max < q3.min)
  }
}
