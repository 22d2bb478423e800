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
}
