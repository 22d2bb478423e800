package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The guarantees sketches actually make: bloom filters never produce
  * false negatives, count-min never under-counts, and the k1 pre-filter
  * is a superset of the exact semi join.
  */
class SketchSpec extends AnyFunSuite with SparkTestBase {

  test("bloom pre-filter keeps every true match (no false negatives)") {
    val d = sf("sf0.001")
    val exact = Tables.orders(spark, d)
      .join(Tables.customer(spark, d).filter(col("c_acctbal") > 0)
        .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    val candidates = graft.operators.Sketches
      .queries("k1_bloom_prefilter")(spark, d)
      .head().getLong(0)
    assert(candidates >= exact) // superset: false positives ok, negatives not
  }

  test("count-min never under-counts") {
    val d = sf("sf0.001")
    val exact = Tables.events(spark, d)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = graft.operators.Sketches
      .queries("k2_countmin_freq")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"count-min under-counted $t: ${est(t)} < $n")
    }
  }

  test("Tuning.recommended applies cleanly to a session builder") {
    // shared session exists; just validate every key/value is accepted
    // by the conf machinery (no typos / removed confs)
    graft.Tuning.recommended.foreach { case (k, v) =>
      spark.conf.isModifiable(k) // must not throw on lookup
      assert(k.startsWith("spark."), k)
      assert(v.nonEmpty)
    }
    assert(graft.Tuning.shufflePartitions(spark) >= 32)
  }
}
