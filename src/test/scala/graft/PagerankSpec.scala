package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hand-verified laws for the PageRank kernels (spec owner for the
  * dangling-mass arithmetic behind m36b; the fixture-graph VALUES are
  * oracle-hashed, this pins the LAW on graphs small enough to compute
  * on paper).
  */
class PagerankSpec extends AnyFunSuite with SparkTestBase {

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    operators.PipelineOps
      .pagerankDirectedFrom(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("one directed iteration redistributes sink mass exactly " +
      "(a→b→c chain, every integer computable by hand)") {
    // N=3, rank₀ = 1e9 each; sinks = {c}, share = 1e9 div 3 = 333333333.
    // a gets no contributions: r'_a = 15e7 + 17·(333333333 div 20)
    //   = 15e7 + 17·16666666 = 433333322
    // b gets a's full rank: r'_b = 15e7 + 17·((1e9+333333333) div 20)
    //   = 15e7 + 17·66666666 = 1283333322; c (fed by b) identically.
    val r = ranksOf(Seq((1L, 2L), (2L, 3L)), iters = 1)
    assert(r === Map(1L -> 433333322L, 2L -> 1283333322L, 3L -> 1283333322L))
  }

  test("a graph whose every node has out-edges pays zero dangling share") {
    // 2-cycle: no sinks ⇒ share = 0; each node receives the other's
    // full rank: r' = 15e7 + 17·(1e9 div 20) = 1e9 — the fixpoint.
    val r = ranksOf(Seq((1L, 2L), (2L, 1L)), iters = 3)
    assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("an in-degree-0 source still appears every round (teleport + share only)") {
    val r = ranksOf(Seq((1L, 2L)), iters = 2)
    // round 1: share = 1e9 div 2 = 5e8 (sink b holds 1e9 of the 2e9).
    //   r'_a = 15e7 + 17·(5e8 div 20) = 575e6
    //   r'_b = 15e7 + 17·((1e9 + 5e8) div 20) = 1425e6
    // round 2: share = 1425e6 div 2 = 7125e5
    //   r''_a = 15e7 + 17·(7125e5 div 20) = 755625000
    //   r''_b = 15e7 + 17·((575e6 + 7125e5) div 20) = 1244375000
    assert(r === Map(1L -> 755625000L, 2L -> 1244375000L))
    // total mass stays within the damped band: the share term is what
    // keeps a sink from silently draining the system
    assert(r.values.sum === 2000000000L)
  }
}
