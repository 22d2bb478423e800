package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Spill-awareness proof (builder-prompt "spill-aware" requirement): at
  * 100 TB, partitions WILL exceed execution memory sometimes, and the
  * engine's answer must be "spill and finish correctly", never OOM or
  * wrong results. Local heaps are too big to hit genuine memory
  * pressure at fixture scale, so the spec forces the spill path through
  * Spark's own operator knob (`spark.sql.windowExec.buffer.spill
  * .threshold` — rows buffered per window partition before spilling to
  * disk) and asserts BOTH that real disk spill happened (task metrics)
  * and that the spilled run is row-identical to the in-memory run.
  */
class SpillSpec extends AnyFunSuite with SparkTestBase {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def spilledBytes(body: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          bytes.addAndGet(te.taskMetrics.diskBytesSpilled)
    }
    spark.sparkContext.addSparkListener(l)
    // bounded drain, not a fixed sleep — late onTaskEnd events on a
    // loaded host would read diskBytesSpilled=0 and flake (ADVICE r9)
    try { body; org.apache.spark.GraftSparkInternals.drainListenerBus(
      spark.sparkContext, 10000) }
    finally spark.sparkContext.removeSparkListener(l)
    bytes.get()
  }

  test("w3 running sum: forced window spill is row-identical and really spills") {
    // rows buffer in a plain array until in.memory.threshold, move to
    // the spillable sorter after it, and hit disk at spill.threshold —
    // both knobs must drop for fixture-sized partitions to spill
    val q = operators.Windows.queries("w3_running_sum")
    val inMemory = q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
    var spilledRows: Seq[String] = Seq.empty
    val spilled = spilledBytes {
      withConf("spark.sql.windowExec.buffer.in.memory.threshold", "16") {
        withConf("spark.sql.windowExec.buffer.spill.threshold", "16") {
          spilledRows = q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
        }
      }
    }
    assert(spilled > 0L, "window operator never spilled — threshold knob ineffective")
    assert(spilledRows === inMemory, "spilled run diverged from in-memory run")
  }

  test("j8 cross join: forced build-buffer spill is row-identical and really spills") {
    // the cartesian operator buffers the right side in the same
    // spillable array; its thresholds are session-settable
    val q = operators.Joins.queries("j8_cross_join")
    val inMemory = q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
    var spilledRows: Seq[String] = Seq.empty
    val spilled = spilledBytes {
      // without the broadcast ban the tiny dimension side broadcasts and
      // the plan is a BroadcastNestedLoopJoin — no cartesian buffer at all
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        withConf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1") {
          withConf("spark.sql.cartesianProductExec.buffer.in.memory.threshold", "4") {
            withConf("spark.sql.cartesianProductExec.buffer.spill.threshold", "4") {
              spilledRows = q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
            }
          }
        }
      }
    }
    assert(spilled > 0L, "cartesian buffer never spilled — threshold knob ineffective")
    assert(spilledRows === inMemory, "spilled run diverged from in-memory run")
  }

  test("a2 hash aggregate: forced sort-based fallback spills and is row-identical") {
    // the third buffer family (VERDICT r9 next #5): HashAggregateExec
    // falls back to sort-based aggregation when the hash map can't grow
    // — Spark's own test hook (testFallbackStartsAt) forces exactly that
    // path, and the map's dump into UnsafeKVExternalSorter writes real
    // spill files (diskBytesSpilled > 0 verified).
    val q = operators.Aggregates.queries("a2_group_agg")
    val inMemory = q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
    var spilledRows: Seq[String] = Seq.empty
    val spilled = spilledBytes {
      withConf("spark.sql.TungstenAggregate.testFallbackStartsAt", "1,2") {
        spilledRows = q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
      }
    }
    assert(spilled > 0L, "hash-agg fallback never spilled — test hook ineffective")
    assert(spilledRows === inMemory, "spilled run diverged from in-memory run")
  }

  test("a7 collect_list: object-hash sort-based fallback is row-identical") {
    // ObjectHashAggregate's fallback (per-group OBJECT buffers, e.g.
    // collect_list) is forced by its session-settable row-count
    // threshold; its sorter only touches disk via the core force-spill
    // conf or genuine memory pressure, neither reachable per-session on
    // a shared local context — so this pins the fallback path's
    // CORRECTNESS, while the disk-write machinery itself (the same
    // UnsafeKVExternalSorter) is proven by the a2 test above.
    val q = operators.Aggregates.queries("a7_collect_list")
    val inMemory = q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
    val viaFallback =
      withConf("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2") {
        q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
      }
    assert(viaFallback === inMemory, "sort-based fallback diverged from hash path")
  }

  test("j1 sort-merge join: forced external-sort spill is row-identical and really spills") {
    // the fourth buffer family: the SortExecs feeding a sort-merge join
    // run on UnsafeExternalSorter — the sorter that spills under real
    // memory pressure at 100 TB. Its force-spill element threshold is a
    // CORE conf (fixed at context creation), so the spill is forced the
    // way Spark's own SortSuite does it: rewrite the executed plan with
    // SortExec.testSpillFrequency, which makes the sorter hit disk
    // every N input rows. Broadcast is banned so the equi-join actually
    // plans as SMJ with a sort on each side; AQE is off so the physical
    // tree is inspectable/rewritable directly.
    val q = operators.Joins.queries("j1_inner_join")
    val inMemory = q(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
    var spilledRows: Seq[String] = Seq.empty
    var sortCount = 0
    val spilled = spilledBytes {
      withConf("spark.sql.adaptive.enabled", "false") {
        withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
          withConf("spark.sql.join.preferSortMergeJoin", "true") {
            val plan = q(spark, sf("sf0.001")).queryExecution.executedPlan
            val forced = plan.transform {
              case s: org.apache.spark.sql.execution.SortExec =>
                sortCount += 1
                s.copy(testSpillFrequency = 4)
            }
            spilledRows = forced.executeCollectPublic().map(_.toString).sorted.toSeq
          }
        }
      }
    }
    assert(sortCount >= 2, s"expected an SMJ with a sort per side, saw $sortCount sorts")
    assert(spilled > 0L, "external sort never spilled — testSpillFrequency ineffective")
    assert(spilledRows === inMemory, "spilled run diverged from in-memory run")
  }
}
