package graft

import graft.plans.AsOfJoinApi
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator must agree with the composed window-rank
  * formulation (j9) — same latest-at-or-before semantics, same
  * tiebreaks — while planning as a single-exchange-per-side sorted
  * merge instead of join+window.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  test("native as-of join ≡ composed j9 formulation on sf0.001") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val native = AsOfJoinApi.asofJoin(p, c,
        "user_id", "c_user", "p_ts", "c_ts", "c_id")
      .select(col("p_id"), col("user_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val composed = graft.operators.Joins.queries("j9_asof_join")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("as-of join handles empty right side (all left rows survive, null match)") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (2L, 100L, 20L)).toDF("id", "k", "t")
    val right = Seq.empty[(Long, Long, Long)].toDF("rid", "rk", "rt")
    val out = AsOfJoinApi.asofJoin(left, right, "k", "rk", "t", "rt", "rid")
    assert(out.count() === 2)
    assert(out.filter(col("rid").isNotNull).count() === 0)
  }

  test("as-of picks the greatest ts ≤ left ts, tiebroken by id") {
    import spark.implicits._
    val left = Seq((1L, 7L, 100L)).toDF("id", "k", "t")
    val right = Seq(
      (10L, 7L, 50L), (11L, 7L, 100L), (12L, 7L, 100L), // tie at ts=100
      (13L, 7L, 101L),                                   // after left ts
      (99L, 8L, 10L)                                     // other key
    ).toDF("rid", "rk", "rt")
    val r = AsOfJoinApi.asofJoin(left, right, "k", "rk", "t", "rt", "rid")
      .select("rid").head()
    assert(r.getLong(0) === 12L) // ts tie → larger rid wins
  }

  test("multi-column (string, long) key as-of join matches the composed form") {
    import spark.implicits._
    val left = Seq(
      ("a", 1L, 101L, 100L), ("a", 2L, 102L, 50L),
      ("b", 1L, 103L, 100L), ("c", 9L, 104L, 100L))
      .toDF("dept", "grp", "id", "t")
    val right = Seq(
      ("a", 1L, 11L, 90L), ("a", 1L, 12L, 100L), ("a", 1L, 13L, 101L),
      ("a", 2L, 21L, 50L), ("b", 1L, 31L, 99L), ("b", 2L, 32L, 10L))
      .toDF("rdept", "rgrp", "rid", "rt")
    val native = AsOfJoinApi.asofJoin(left, right,
        Seq("dept", "grp"), Seq("rdept", "rgrp"), "t", "rt", "rid")
      .select($"id", $"rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // composed oracle: equi-join + ts filter + max-(ts, id) per left row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"rt".desc, $"rid".desc)
    val composed = left.join(right,
        $"dept" === $"rdept" && $"grp" === $"rgrp" && $"rt" <= $"t", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("rid"))) -1L else r.getAs[Long]("rid"))).toMap
    assert(native === composed)
    assert(native(101L) === 12L) // greatest rt <= 100 within ("a",1)
    assert(native(104L) === -1L) // no key match -> null
  }

  test("single string key goes through the general ordering path") {
    import spark.implicits._
    val left = Seq(("x", 1L, 100L), ("y", 2L, 100L)).toDF("k", "id", "t")
    val right = Seq(("x", 10L, 60L), ("x", 11L, 99L), ("z", 12L, 1L))
      .toDF("rk", "rid", "rt")
    val got = AsOfJoinApi.asofJoin(left, right, "k", "rk", "t", "rt", "rid")
      .select($"id", $"rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 11L, 2L -> -1L))
  }

  test("general path matches null keys to null keys (IS NOT DISTINCT semantics)") {
    import spark.implicits._
    val left = Seq((1L, Option.empty[String], 100L), (2L, Option("x"), 100L))
      .toDF("id", "k", "t")
    val right = Seq((10L, Option.empty[String], 50L), (11L, Option("x"), 60L))
      .toDF("rid", "rk", "rt")
    val got = AsOfJoinApi.asofJoin(left, right, "k", "rk", "t", "rt", "rid")
      .select($"id", $"rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // documented deviation from equi-join NULL semantics: the ordering-
    // based merge pairs the null-keyed rows (AsOfJoin scaladoc)
    assert(got === Map(1L -> 10L, 2L -> 11L))
  }

  test("as-of plan has no window exchange (single pass per side)") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val plan = AsOfJoinApi.asofJoin(p, c,
        "user_id", "c_user", "p_ts", "c_ts", "c_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // physical nodeName strips "Exec"
    assert(!plan.contains("Window"), plan)
    // exactly one exchange per side — the whole point vs join+window
    assert("Exchange".r.findAllIn(plan).size === 2, plan)
  }

  test("merge stage allocates zero execution memory at any input size (O(1) posture)") {
    // The streamed merge buffers only a one-row lookahead plus the
    // current best match and registers no task-memory consumer (see
    // AsOfJoinExec.doExecute scaladoc). Proven mechanically on the
    // pathological shape — ALL right rows one key, every ts at-or-
    // before every left ts, i.e. the "buffer the whole partition" worst
    // case for a naive implementation: peakExecutionMemory of the bare
    // merge stage (LocalTableScan children, no sorts, no shuffles) is
    // EXACTLY 0 at two sizes 16× apart. A buffering implementation
    // could pass only by allocating its buffer off the task memory
    // manager, which is what the spill gates exist to forbid.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.execution.{CoalesceExec, LocalTableScanExec}
    import org.apache.spark.sql.types.LongType

    def peakMemOfMerge(nRight: Int): (Long, Long) = {
      val lk = AttributeReference("k", LongType, nullable = false)()
      val lt = AttributeReference("t", LongType, nullable = false)()
      val rk = AttributeReference("rk", LongType, nullable = false)()
      val rt = AttributeReference("rt", LongType, nullable = false)()
      // left: 8 probes, all ts AFTER every right row; right: one hot key
      val lRows = (1 to 8).map(i => InternalRow(7L, 1000000L + i))
      val rRows = (1 to nRight).map(i => InternalRow(7L, i.toLong))
      val exec = graft.plans.AsOfJoinExec(
        CoalesceExec(1, LocalTableScanExec(Seq(lk, lt), lRows, None)),
        CoalesceExec(1, LocalTableScanExec(Seq(rk, rt), rRows, None)),
        Seq(lk), Seq(rk), lt, rt, rt)
      val peak = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            peak.getAndUpdate(m => math.max(m, te.taskMetrics.peakExecutionMemory))
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val n = exec.execute().count()
        org.apache.spark.GraftSparkInternals.drainListenerBus(
          spark.sparkContext, 10000)
        (n, peak.get())
      } finally spark.sparkContext.removeSparkListener(l)
    }

    val (n1, peak1) = peakMemOfMerge(16 * 1024)
    val (n2, peak2) = peakMemOfMerge(256 * 1024)
    assert(n1 === 8L && n2 === 8L)
    assert(peak1 === 0L, s"merge registered execution memory at 16k rows: $peak1")
    assert(peak2 === 0L, s"merge registered execution memory at 256k rows: $peak2")
  }
}
