package graft

import graft.operators.SetOps
import org.scalatest.funsuite.AnyFunSuite

/** Result-order assertions the hash-compare oracle can't see (it sorts
  * before comparing): O1's global sort really is ordered, O2's top-k is
  * the true top-k.
  */
class OrderingSpec extends AnyFunSuite with SparkTestBase {

  test("o1 output arrives globally ordered (price desc, key asc)") {
    val rows = SetOps.queries("o1_global_sort")(spark, sf("sf0.001"))
      .collect().map(r => (r.getDouble(1), r.getLong(0)))
    val resorted = rows.sortBy { case (p, k) => (-p, k) }
    assert(rows.toSeq === resorted.toSeq)
  }

  test("o2 returns exactly the true top-10 by total price") {
    import org.apache.spark.sql.functions._
    val topk = SetOps.queries("o2_limit_topk")(spark, sf("sf0.001"))
      .collect().map(_.getLong(0)).toSeq
    val want = Tables.orders(spark, sf("sf0.001"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).take(10).toSeq
    assert(topk === want)
    assert(topk.size === 10)
  }

  test("j7b bucketed range join ≡ j7 plain range join") {
    val j7 = graft.operators.Joins.queries("j7_range_join")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val j7b = graft.operators.Joins.queries("j7b_range_join_bucketed")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(j7b === j7)
  }

  test("w4 time-sharded range frame ≡ plain per-user range frame") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    // the production entry shards by (user, 24h) with fringe
    // replication; this recomputes the textbook single-partition-per-
    // user form and demands bit-identical doubles on every event
    val sharded = graft.operators.Windows.queries("w4_range_frame")(
        spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(1), (r.getLong(0), r.getDouble(2)))).toMap
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-86400L, 0L)
    val plain = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("event_id"), col("value"),
        unix_timestamp(col("ts")).as("epoch_s"))
      .select(col("user_id"), col("event_id"),
        (sum(graft.Exprs.slong(col("value"), 2)).over(w).cast(DoubleType)
          / 100.0 / count(lit(1)).over(w)).as("avg_24h"))
      .collect().map(r => (r.getLong(1), (r.getLong(0), r.getDouble(2)))).toMap
    assert(sharded.size === plain.size)
    assert(sharded === plain)
  }
}
