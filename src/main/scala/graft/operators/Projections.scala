package graft.operators

import graft.Exprs._
import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection / filter / predicate operators (SURVEY.md §2B P1–P9).
  *
  * Every predicate here is a plain Catalyst expression, so it reaches the
  * parquet scan as a pushed filter and the projection prunes the read
  * schema — `.explain` shows PushedFilters/ReadSchema. At 100 TB that is
  * the difference between scanning 11 columns and scanning 2.
  */
object Projections {

  val queries: Map[String, Q] = Map(
    // P1: column projection + rename (R8 shape on lineitem).
    "p1_project_rename" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey").as("order_key"),
        col("l_partkey").as("part_key"),
        col("l_quantity").as("qty"),
        col("l_returnflag").as("flag"))
    }),

    // P2: nested struct path extraction (R8's players.white.user.name
    // shape) — build a 3-level struct, then project a dotted path through
    // it; Catalyst collapses the CreateStruct/GetStructField pair.
    "p2_nested_path" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          struct(struct(col("c_name").as("name")).as("user"),
            col("c_acctbal").as("balance")).as("profile"))
        .select(col("c_custkey"), col("profile.user.name").as("cust_name"))
    }),

    // P3: conjunctive equality filter (R7 shape).
    "p3_filter_eq" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // P4: range / comparison predicates on number + timestamp.
    // (r12: the original < 1995-01-01 bound PREDATED the fixture's
    // earliest shipdate, so the range filter matched nothing — a
    // vacuous pushdown pin; the 1996 bound keeps 861 rows at sf0.01)
    "p4_filter_range" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate") < lit("1996-01-01").cast(TimestampType))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // P5: IN-list predicate.
    "p5_filter_in" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    // P6: NULL predicates (acctbal carries no nulls in the fixture, so
    // synthesize one with nullif to exercise both branches).
    "p6_filter_null" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("MACHINERY")).as("seg"))
        .filter(col("seg").isNull)
        .select(col("c_custkey"))
    }),

    // P7: LIKE and RLIKE predicates.
    "p7_filter_like" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").like("%green%") || col("p_name").rlike("^bl(ue|ack)"))
        .select(col("p_partkey"), col("p_name"))
    }),

    // P8: computed projection. Pure double arithmetic: both engines
    // evaluate the identical IEEE-754 expression tree per row, so the
    // results are bit-identical with no decimal round-trip needed.
    "p8_computed" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    // P9: CASE WHEN bucketing.
    "p9_case_when" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("bucket"))
    }),

    // P10: THREE-VALUED-LOGIC probe — the SQL null semantics that
    // silently corrupt pipelines when an engine gets them subtly wrong:
    // `NOT IN` against a set containing NULL matches NOTHING (x <> NULL
    // is UNKNOWN, so the conjunction never reaches TRUE), null-safe
    // equality (<=>, IS NOT DISTINCT FROM) treats two NULLs as equal
    // where `=` yields UNKNOWN, and UNKNOWN-under-NOT stays UNKNOWN.
    // Nulls are synthesized with nullif so both branches populate; every
    // column is a BOOLEAN verdict, hash-compared against DuckDB's
    // standard-conformant answers.
    "p10_null_semantics" -> ((s, d) => {
      val seg = nullif(col("c_mktsegment"), lit("MACHINERY"))
      Tables.customer(s, d).select(
        col("c_custkey"),
        seg.isin("BUILDING", "AUTOMOBILE").as("in_set"),
        // NOT IN (..., NULL): never TRUE, FALSE only for members, else NULL
        (!seg.isin(null, "BUILDING")).as("not_in_with_null"),
        (seg <=> nullif(col("c_mktsegment"), lit("MACHINERY")))
          .as("nullsafe_self"),
        (seg === lit("BUILDING")).as("eq_building"),
        coalesce(seg, lit("∅")).as("seg_or_empty"))
    })
  )

  val oracles: Map[String, String] = Map(
    "p1_project_rename" ->
      """SELECT l_orderkey AS order_key, l_partkey AS part_key,
        |  l_quantity AS qty, l_returnflag AS flag FROM lineitem""".stripMargin,

    "p2_nested_path" ->
      """SELECT c_custkey,
        |  ({'user': {'name': c_name}, 'balance': c_acctbal}).user.name AS cust_name
        |FROM customer""".stripMargin,

    "p3_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'""".stripMargin,

    "p4_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'""".stripMargin,

    "p5_filter_in" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')""".stripMargin,

    "p6_filter_null" ->
      """SELECT c_custkey FROM customer
        |WHERE NULLIF(c_mktsegment, 'MACHINERY') IS NULL""".stripMargin,

    "p7_filter_like" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE '%green%' OR regexp_matches(p_name, '^bl(ue|ack)')""".stripMargin,

    "p10_null_semantics" ->
      """SELECT c_custkey,
        |  NULLIF(c_mktsegment, 'MACHINERY') IN ('BUILDING','AUTOMOBILE')
        |    AS in_set,
        |  NULLIF(c_mktsegment, 'MACHINERY') NOT IN (NULL, 'BUILDING')
        |    AS not_in_with_null,
        |  NULLIF(c_mktsegment, 'MACHINERY')
        |    IS NOT DISTINCT FROM NULLIF(c_mktsegment, 'MACHINERY')
        |    AS nullsafe_self,
        |  NULLIF(c_mktsegment, 'MACHINERY') = 'BUILDING' AS eq_building,
        |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), '∅') AS seg_or_empty
        |FROM customer""".stripMargin,

    "p8_computed" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem""".stripMargin,

    "p9_case_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'low'
        |       WHEN o_totalprice < 150000 THEN 'mid'
        |       ELSE 'high' END AS bucket
        |FROM orders""".stripMargin
  )
}
