package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical jobs-per-iteration law for the iterative kernels
  * (VERDICT r14 item 6): every kernel that claims "linear in rounds"
  * must spend a CONSTANT number of Spark jobs per additional round —
  * the O(iters²) regression class (iteration k re-executing 1..k−1
  * because lineage wasn't truncated) shows up as a growing per-round
  * delta and was previously caught only by one-off measurement.
  *
  * Method: run the kernel fresh at several round counts, count the
  * submitted jobs through a listener with a sentinel-bounded FIFO
  * drain, and assert the per-round delta is constant. The
  * kernels pin their join strategies (shuffle-hash hints, explicit
  * 1-row broadcasts), so the per-round plan SHAPE is data-independent
  * and the job count deterministic.
  *
  * m5's contraction loop is deliberately out of scope: its rounds are
  * data-adaptive (pointer-jumping runs to fixpoint within a round, the
  * contracted graph shrinks geometrically, and convergence exits the
  * loop), so "jobs per round" has no fixed round index to grow with;
  * DedupSpec owns its convergence laws. sql8's recursion happens
  * inside one SQL statement (engine-internal), not a driver loop.
  */
class JobLinearitySpec extends AnyFunSuite with SparkTestBase {

  /** Jobs submitted under `body`, via a unique job group. Local
    * properties propagate to AQE/broadcast worker threads, so stage
    * materialization jobs are counted too. Listener delivery is
    * asynchronous but FIFO per listener: a sentinel job in a second
    * group marks the point where every job of `body` has provably been
    * delivered — no lossy polling window.
    */
  private def jobsDuring(tag: String)(body: => Unit): Int = {
    val group = s"joblaw_${tag}_${System.nanoTime()}"
    val sentinel = s"${group}_sentinel"
    val sc = spark.sparkContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        seen.add(Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id", "")).getOrElse(""))
    }
    sc.addSparkListener(l)
    try {
      sc.setJobGroup(group, tag, interruptOnCancel = false)
      try body finally sc.clearJobGroup()
      // every action in the kernels is blocking, so once `body` returns
      // no further jobs of its can be submitted; the sentinel therefore
      // bounds them all in the FIFO event order. Jobs are counted RAW
      // (not by group): one thread-pool job per run predates the group
      // property capture, and the forked test JVM runs suites
      // sequentially, so nothing else submits jobs concurrently.
      sc.setJobGroup(sentinel, tag, interruptOnCancel = false)
      try spark.range(1).rdd.count() finally sc.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!seen.contains(sentinel) && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(seen.contains(sentinel), "listener bus never drained")
      var n = 0
      var sawSentinel = false
      seen.forEach { g =>
        if (g == sentinel) sawSentinel = true
        else if (!sawSentinel) n += 1
      }
      n
    } finally sc.removeSparkListener(l)
  }

  private def assertLinear(tag: String, counts: Seq[(Int, Int)]): Unit = {
    val deltas = counts.sliding(2).map { case Seq((r0, j0), (r1, j1)) =>
      (j1 - j0).toDouble / (r1 - r0)
    }.toSeq
    assert(deltas.forall(_ > 0), s"$tag: rounds must cost jobs: $counts")
    assert(deltas.distinct.size == 1,
      s"$tag: jobs-per-round must be constant in the round index " +
        s"(counts=$counts deltas=$deltas) — a growing delta is the " +
        "O(iters²) lineage-re-execution regression")
  }

  /** One throwaway kernel run: the session's FIRST touch of a parquet
    * table pays a one-time file-listing job that would otherwise inflate
    * the first measurement point by +1 (a session constant, not a
    * per-round cost).
    */
  private def warmup(d: String): Unit =
    operators.PipelineOps.pagerankSymmetric(spark, d, iters = 1, ckptEvery = 1)
      .foreach(_ => ())

  test("m36 pagerank (symmetric, ckptEvery=1): constant jobs per iteration") {
    val d = sf("sf0.001")
    warmup(d)
    val counts = Seq(2, 3, 4).map { it =>
      it -> jobsDuring(s"m36_$it") {
        operators.PipelineOps.pagerankSymmetric(spark, d, iters = it,
          ckptEvery = 1).foreach(_ => ())
      }
    }
    assertLinear("m36/ckpt1", counts)
  }

  test("m36 pagerank (production ckptEvery=2): constant jobs per 2-round block") {
    val d = sf("sf0.001")
    warmup(d)
    val counts = Seq(2, 4, 6).map { it =>
      it -> jobsDuring(s"m36b2_$it") {
        operators.PipelineOps.pagerankSymmetric(spark, d, iters = it,
          ckptEvery = 2).foreach(_ => ())
      }
    }
    assertLinear("m36/ckpt2", counts)
  }

  test("m36b pagerank (directed + dangling mass): constant jobs per 2-round block") {
    // r16: m36b adopted m36's measured checkpoint cadence (every 2
    // rounds + tail), so the constant-cost unit is the 2-round block,
    // exactly like the m36/ckpt2 law above
    val d = sf("sf0.001")
    warmup(d)
    val counts = Seq(2, 4, 6).map { it =>
      it -> jobsDuring(s"m36d_$it") {
        operators.PipelineOps.pagerankDirected(spark, d, iters = it)
          .foreach(_ => ())
      }
    }
    assertLinear("m36b", counts)
  }

  test("l28 BPE merge loop: constant jobs per training round") {
    import spark.implicits._
    // a chain-merge corpus: each round fuses one adjacent pair of the
    // long word, so ≥6 productive rounds exist and no round ties
    val docs = Seq("abcdefg abcdefg abcdefg xy xy").toDF("text")
    def seqs() = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .groupBy("w").count().withColumnRenamed("count", "freq")
      .select(org.apache.spark.sql.functions.expr(
        "concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)), array('</w>'))").as("syms"),
        org.apache.spark.sql.functions.col("freq"))
    val counts = Seq(2, 3, 4).map { r =>
      r -> jobsDuring(s"l28_$r") {
        operators.Bpe.trainFromSeqs(seqs(), r).foreach(_ => ())
      }
    }
    assertLinear("l28", counts)
  }
}
