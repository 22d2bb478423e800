package graft

import graft.operators.PipelineOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The two-level prefix sum behind m4/m9/m10 and m11's shard-width law
  * (VERDICT r7 perf #1/#2): a running sum windowed on the ~10 mixture
  * sources serializes one source per task at 100 TB, and a fixed
  * 256-shard global shuffle is ~400 GB per window sort. These pin (a)
  * value equivalence with the naive single-window form, (b) the plan
  * property that the full-data window is keyed by (source, shard), not
  * source alone, and (c) the stats-driven width laws.
  */
class PrefixSumSpec extends AnyFunSuite with SparkTestBase {

  // plain .collect stops at the AdaptiveSparkPlanExec wrapper; descend
  // into it so the pre-execution window nodes are visible
  private def windows(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      windows(a.executedPlan)
    case w: org.apache.spark.sql.execution.window.WindowExec =>
      w +: w.children.flatMap(windows)
    case other => other.children.flatMap(windows)
  }

  private def windowKeys(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    windows(df.queryExecution.executedPlan)
      .map(_.partitionSpec.map(_.references.map(_.name).mkString(",")))

  test("m4/m9/m10 big-data windows are sharded, never keyed by source alone") {
    for (q <- Seq("m4_token_budget", "m9_sequence_pack", "m10_mixture_sample")) {
      val df = PipelineOps.queries(q)(spark, sf("sf0.001"))
      val keys = windowKeys(df)
      assert(keys.nonEmpty, s"$q plans no window")
      // exactly one window may be keyed by source alone: the offset
      // roll-up over the (source × shard)-row aggregate, never the
      // full-data window (which must carry the shard key).
      val sharded = keys.count(_.exists(_.contains("__shard")))
      assert(sharded >= 1, s"$q windows $keys carry no shard key")
      val sourceOnly = keys.count(k => k.forall(!_.contains("__shard")))
      assert(sourceOnly <= 1, s"$q has ${sourceOnly} unsharded windows: $keys")
    }
  }

  test("sharded running sum equals the naive single-window form") {
    val naive = {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_toks").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(spark, sf("sf0.001"))
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("n_toks"))
        .withColumn("cum_toks", sum(col("n_toks")).over(w))
        .filter(col("cum_toks") <= 5000)
        .select(col("doc_id"), col("source"), col("n_toks"), col("cum_toks"))
    }
    val sharded = PipelineOps.queries("m4_token_budget")(spark, sf("sf0.001"))
    assert(sharded.exceptAll(naive).isEmpty && naive.exceptAll(sharded).isEmpty,
      "two-level prefix sum diverges from single-window reference")
  }

  test("sharded running sum equals naive on adversarial synthetic data") {
    // skewed part sizes (one part holds ~2/3 of rows), heavy duplicate
    // order keys (tiebreak on id does the real work), negative values,
    // and a singleton part — the shapes a range sampler and the offset
    // join must not get wrong
    import spark.implicits._
    val rows = (0 until 3000).map { i =>
      val part = if (i % 3 != 0) "hot" else s"src${i % 11}"
      (i.toLong, part, (i * 7) % 13, (i * 2654435761L % 97) - 48)
    } :+ (99999L, "lonely", 0, 5L)
    val df = rows.toDF("id", "part", "ord", "v")
    val ord = Seq(col("ord"), col("id"))
    val sharded = PipelineOps.shardedRunningSum(
      PipelineOps.rangeSharded(df, col("part"), ord),
      "part", "__shard", ord, "v", "cum", shards = 64)
    val w = Window.partitionBy(col("part")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("cum", sum(col("v")).over(w))
    assert(sharded.select("id", "cum").exceptAll(naive.select("id", "cum")).isEmpty
      && naive.select("id", "cum").exceptAll(sharded.select("id", "cum")).isEmpty,
      "sharded ≠ naive on adversarial input")
    // the beyond-the-gate arm (offsets NOT broadcast — the 100 TB shape
    // where 2^20 shards would ship MBs to every executor) must produce
    // the identical result through the equi-shuffle join
    val unbroadcast = PipelineOps.shardedRunningSum(
      PipelineOps.rangeSharded(df, col("part"), ord),
      "part", "__shard", ord, "v", "cum", shards = 1L << 20)
    assert(unbroadcast.select("id", "cum")
        .exceptAll(naive.select("id", "cum")).isEmpty
      && naive.select("id", "cum")
        .exceptAll(unbroadcast.select("id", "cum")).isEmpty,
      "shuffle-join offsets arm ≠ naive")
    // and the empty frame degenerates cleanly
    val empty = PipelineOps.shardedRunningSum(
      PipelineOps.rangeSharded(df.limit(0), col("part"), ord),
      "part", "__shard", ord, "v", "cum", shards = 64)
    assert(empty.count() == 0)
  }

  test("offsets broadcast gate: fixture widths in, 2^20-shard cap out") {
    assert(PipelineOps.broadcastOffsets(32))
    assert(PipelineOps.broadcastOffsets(8192))
    assert(!PipelineOps.broadcastOffsets(1 << 20))
  }

  test("m4's two consumers of the range shuffle share ONE exchange (reuse pin)") {
    // shardedRunningSum stamps __shard = spark_partition_id() on the
    // range-repartitioned frame and consumes it twice (offsets aggregate
    // + local window). The stamps agree across consumers only because
    // ReuseExchange dedupes the range shuffle — two independent
    // exchanges would sample boundaries independently and join offsets
    // against mismatched shard labels (ADVICE r8). Pin it: after
    // execution the final adaptive plan must contain exactly one
    // materialized range exchange; the second consumer reads it as a
    // reused stage.
    val df = PipelineOps.queries("m4_token_budget")(spark, sf("sf0.001"))
    df.collect()
    // AQE toString prints final + initial plan; judge the FINAL one, and
    // don't count a ReusedExchange's reference text as a second exchange
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val ranges = p.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    assert(ranges == 1, s"expected 1 materialized range exchange, got $ranges:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(p.contains("ReusedExchange"), p.take(3000))
  }

  test("hexShardChars width law: fixture floor, 100 TB growth, monotone") {
    val gb = BigInt(1) << 30
    // fixture-scale documents (~MBs) stay at the floor → m11's oracle
    // keeps its 256-shard substr(pri,1,2) shape
    assert(PipelineOps.hexShardChars((gb >> 10) * 8, 2, 256L << 20) == 2)
    // 100 TB at 256 MB/shard needs ~400k shards → 5 hex chars (1M)
    assert(PipelineOps.hexShardChars(gb * 1024 * 100, 2, 256L << 20) == 5)
    // never shrinks as data grows, never exceeds the 8-char cap
    val widths = (0 to 60).map(e => PipelineOps.hexShardChars(BigInt(1) << e, 1, 64L << 20))
    assert(widths.sliding(2).forall(p => p.head <= p.last), widths.toString)
    assert(PipelineOps.hexShardChars(BigInt(10).pow(30), 2, 1L) == 8)
  }

  test("m17 peak concurrency: sharded arm ≡ plain-window arm (constant-key shape)") {
    // the entry's plan-stats gate picks the plain global window at
    // fixture scale, so this pins the SHARDED arm (the 100 TB path,
    // constant part key + desc tiebreak ordering — a shape the m4-form
    // equivalence tests don't cover) against it on the same sessions
    val sess = PipelineOps.queries("m1_sessionize")(spark, sf("sf0.001"))
    def peaks(sharded: Boolean) =
      PipelineOps.peakConcurrency(sess, forceSharded = Some(sharded))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = peaks(sharded = false)
    assert(plain === peaks(sharded = true))
    assert(plain.nonEmpty)
  }

  test("m11 shard assignment is (seed, doc_id)-stable for a given width") {
    // the shard hash never depends on the width law: widening k only
    // reads MORE prefix chars, so a shard at k+1 nests inside its k
    // parent — reshuffling the law never re-keys existing shards'
    // prefixes (a data loader can split shards without re-hashing).
    val df = PipelineOps.queries("m11_global_shuffle")(spark, sf("sf0.001"))
    val recomputed = df.withColumn("expect",
        substring(md5(concat(lit("shuf:42:"), col("doc_id").cast("string"))
          .cast("binary")), 1, 2))
      .filter(col("shard") =!= col("expect")).count()
    assert(recomputed == 0, s"$recomputed rows off the (seed,doc_id) shard law")
  }
}
