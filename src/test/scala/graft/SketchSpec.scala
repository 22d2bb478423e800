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

  test("k3 HLL merge algebra: union of daily sketches ≡ whole-data sketch, near exact") {
    val d = sf("sf0.001")
    val merged = graft.operators.Sketches.queries("k3_hll_merge")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === exact.keySet)
    for ((k, m) <- merged) {
      // mergeability: building daily and unioning sees the same values
      // as one whole-data sketch — identical estimate
      assert(m === whole(k), s"$k merged=$m whole=${whole(k)}")
      // accuracy: within HLL(lgK=12) error of the exact distinct
      assert(math.abs(m - exact(k)) <= 0.05 * exact(k) + 1,
        s"$k est=$m exact=${exact(k)}")
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
