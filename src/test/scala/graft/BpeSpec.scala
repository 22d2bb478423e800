package graft

import graft.operators.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer semantics on hand-verifiable corpora: the spec owner for
  * the rows-only l28 entry (l28b hash-checks the round-1 statistics).
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  private def merges(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, String, Long)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getLong(3))).sortBy(_._1).toSeq

  test("fuse law: ≡ the one-pass recursive specification on generated " +
      "sequences (left-to-right, non-overlapping, concatenation-preserving)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the executable SPECIFICATION: consume two symbols on a match,
    // one otherwise — structural recursion, no indices to get wrong
    def fuseRef(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r => (l + r) :: fuseRef(rest, l, r)
        case a :: rest => a :: fuseRef(rest, l, r)
        case Nil => Nil
      }
    val sym = Gen.oneOf("a", "b", "ab", "ba", "</w>")
    val caseGen = for {
      n <- Gen.choose(0, 12)
      syms <- Gen.listOfN(n, sym)
      l <- sym
      r <- sym
    } yield (syms, l, r)
    // fixed seeds (the PropertySpec convention — exactly reproducible);
    // the tiny alphabet with composite symbols ("ab" next to "a","b")
    // makes overlap and self-pair (l == r) cases dense
    (1L to 400L).foreach { seed =>
      val (syms, l, r) =
        caseGen.pureApply(Gen.Parameters.default, Seed(seed))
      val got = Bpe.fuse(syms, l, r)
      assert(got === fuseRef(syms, l, r), s"seed=$seed syms=$syms pair=($l,$r)")
      assert(got.mkString === syms.mkString,
        s"fuse must preserve the concatenation: seed=$seed")
    }
  }

  test("fuse is greedy left-to-right and non-overlapping") {
    assert(Bpe.fuse(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.fuse(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(Bpe.fuse(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    assert(Bpe.fuse(Seq("l", "o", "w", "</w>"), "o", "w") ===
      Seq("l", "ow", "</w>"))
  }

  test("the classic low/lower/lowest corpus learns 'lo' then 'low' first") {
    // word freqs: low x3, lower x2, lowest x1 → every word contributes
    // (l,o) and (o,w): both count 6; tiebreak (l,o) < (o,w) picks (l,o),
    // after which (lo,w) counts 6 and must win round 2
    val df = corpus("low low lower", "low lower lowest")
    val m = merges(Bpe.train(df, 3))
    assert(m(0)._2 === "l" && m(0)._3 === "o" && m(0)._4 === 6L)
    assert(m(1)._2 === "lo" && m(1)._3 === "w" && m(1)._4 === 6L)
    // round 3: low</w> x3 vs e,r x3 (from lower+lowest... e,r only in
    // lower x2; (low,e) x3 from lower+lowest) — (low,</w>) x3 ties
    // (low,e) x3; lexicographic: "low" == "low", then "</w>" < "e"
    assert(m(2)._2 === "low" && m(2)._3 === "</w>" && m(2)._4 === 3L)
  }

  test("merged symbols tokenize the training words consistently " +
      "(applying the merge table reproduces whole words)") {
    val df = corpus("ab ab ab ab")
    val m = merges(Bpe.train(df, 5))
    // 'ab' x4: round 1 (a,b) x4, round 2 (ab,</w>) x4, then no pairs
    // remain anywhere — the trainer must stop early, not emit junk
    assert(m.map(x => (x._2, x._3)) === Seq("a" -> "b", "ab" -> "</w>"))
  }

  test("the trainer's first merge is l28b's rank-1 pair (the hashed twin " +
      "pins the kernel every round reuses)") {
    val d = sf("sf0.001")
    val m1 = merges(Bpe.train(Tables.documents(spark, d), 1)).head
    val top = Bpe.queries("l28b_bpe_pairs")(spark, d)
      .filter(org.apache.spark.sql.functions.col("rank") === 1).head()
    assert((m1._2, m1._3, m1._4) ===
      ((top.getString(1), top.getString(2), top.getLong(3))))
  }

  test("merge counts are freq-weighted, not word-distinct") {
    // 'xy' appears 5 times, 'yz' twice: (x,y) must outrank (y,z) on
    // weighted count even though both occur in exactly one distinct word
    val df = corpus("xy xy xy yz", "xy xy yz")
    val m = merges(Bpe.train(df, 1))
    assert(m.head._2 === "x" && m.head._3 === "y" && m.head._4 === 5L)
  }

  test("encode law (l29): rank-order full-fuse ≡ lowest-rank-pair-first " +
      "reference on generated training-shaped merge chains") {
    // the reference is the textbook apply loop: repeatedly find the
    // LOWEST-RANK merge whose pair occurs anywhere, fuse it to
    // exhaustion, restart the scan from rank 0
    def encodeRef(syms: Seq[String], ms: Seq[(String, String)]): Seq[String] = {
      var s = syms
      var progressed = true
      while (progressed) {
        ms.find { case (l, r) =>
          s.indices.dropRight(1).exists(i => s(i) == l && s(i + 1) == r)
        } match {
          case Some((l, r)) => s = Bpe.fuse(s, l, r); progressed = true
          case None => progressed = false
        }
      }
      s
    }
    // generated TRAINING-SHAPED chains: each merge pairs two symbols
    // already available (chars, or outputs of LOWER-rank merges) — the
    // invariant real training produces and the rank-order argument
    // rests on
    val rnd = new scala.util.Random(20260816)
    (1 to 300).foreach { seed =>
      val chars = Seq("a", "b", "c")
      var avail = chars :+ "</w>"
      val ms = (1 to 4).map { _ =>
        val l = avail(rnd.nextInt(avail.size))
        val r = avail(rnd.nextInt(avail.size))
        avail = avail :+ (l + r)
        (l, r)
      }
      val word = Seq.fill(3 + rnd.nextInt(6))(chars(rnd.nextInt(3))) :+ "</w>"
      val viaRankOrder = ms.foldLeft(word) { case (s, (l, r)) => Bpe.fuse(s, l, r) }
      assert(viaRankOrder === encodeRef(word, ms),
        s"seed=$seed word=$word merges=$ms")
      assert(viaRankOrder.mkString === word.mkString,
        s"encode must preserve the concatenation: seed=$seed")
    }
  }
}
