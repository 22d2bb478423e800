package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.functions._

/** Sorts, limits, distinct, and set algebra (SURVEY.md §2B O1–O5).
  *
  * Scale: O2's orderBy+limit plans as TakeOrderedAndProject (per-partition
  * top-k, then a k-row merge on the driver — no global sort). O3/O4/O5
  * distinct-style ops are partial+final hash aggregates on the row value.
  * O1's global sort is the only true range-shuffle here.
  */
object SetOps {

  private def splitA(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
  private def splitB(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))

  val queries: Map[String, Q] = Map(
    // O1: global multi-key sort with explicit null placement. The driver
    // canonicalizer re-sorts, so the oracle checks content; RowsSpec
    // asserts the ordering property itself.
    "o1_global_sort" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // O2: top-k — deterministic because the sort key set is unique.
    "o2_limit_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)
    }),

    // O3: DISTINCT on a column pair.
    "o3_distinct" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"))
        .distinct()
    }),

    // O4: UNION ALL (duplicates kept) of two overlapping splits.
    "o4_union_all" -> ((s, d) => splitA(s, d).unionAll(splitB(s, d))),

    // O4b: UNION DISTINCT of the same splits.
    "o4b_union_distinct" -> ((s, d) =>
      splitA(s, d).union(splitB(s, d)).distinct()),

    // O5: INTERSECT.
    "o5_intersect" -> ((s, d) => splitA(s, d).intersect(splitB(s, d))),

    // O5b: EXCEPT.
    "o5b_except" -> ((s, d) => splitA(s, d).except(splitB(s, d))),

    // O7: MULTISET set ops — intersectAll / exceptAll, the
    // bag-semantics variants o5/o5b's set forms silently differ from
    // whenever rows repeat (here the non-unique (nation, segment)
    // projection: INTERSECT ALL keeps min-multiplicity copies, EXCEPT
    // ALL subtracts occurrence counts instead of erasing the value).
    // Both plan as count-aggregated joins, not row-pair matching, so
    // the shuffle bill is distinct-value-sized at any scale. Tagged
    // union so one frame carries both results.
    "o7_multiset_ops" -> ((s, d) => {
      def proj(f: org.apache.spark.sql.DataFrame) =
        f.select(col("c_nationkey"), col("c_mktsegment"))
      val a = proj(Tables.customer(s, d).filter(col("c_acctbal") > 5000))
      val b = proj(Tables.customer(s, d).filter(col("c_acctbal") > 7500))
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
    }),

    // O8: explicit NULL ORDERING in a global top-k (r13) — Spark sorts
    // nulls FIRST ascending / LAST descending by default, so DESC NULLS
    // FIRST exercises the non-default branch both engines must agree
    // on. Nulls are synthesized on an SF-independent key (event_id < 7:
    // exactly ≤7 null rows at EVERY fixture SF) so the top-20 always
    // crosses the null/value boundary — the pin covers both the null
    // block's internal tiebreak and the transition into real values,
    // never just one side. Plans as TakeOrderedAndProject, no global
    // sort.
    "o8_null_ordering" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          when(col("event_id") < 7, lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
        .orderBy(col("v").desc_nulls_first, col("event_id"))
        .limit(20)
    }),

    // O9: TRANSPOSE (r14) — Spark 4's Dataset.transpose, the report
    // reshape that turns a metrics-per-group frame sideways (groups
    // become columns, metrics become rows). Runs on an AGGREGATED
    // frame by construction — transpose collects the index column to
    // name the output columns, so its input must be group-sized, never
    // the corpus (the same bound a pivot's value list carries; here ~5
    // event types). Metrics are cast to one common type (DOUBLE, the
    // API's coercion rule) and rounded; the oracle rebuilds the
    // transposed frame explicitly with one UNION ALL arm per metric
    // row, so the reshape's cell placement is hash-pinned.
    "o9_transpose" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          round(graft.Exprs.lsum(col("value"), 2), 2).as("sum_value"),
          countDistinct(col("user_id")).cast("double").as("n_users"))
        .transpose(col("event_type"))
    })
  )

  private val aSql = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"
  private val bSql = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"

  val oracles: Map[String, String] = Map(
    "o1_global_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey""".stripMargin,

    "o2_limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "o3_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",

    "o4_union_all" -> s"$aSql UNION ALL $bSql",
    "o4b_union_distinct" -> s"$aSql UNION $bSql",
    "o5_intersect" -> s"$aSql INTERSECT $bSql",
    "o5b_except" -> s"$aSql EXCEPT $bSql",

    "o7_multiset_ops" ->
      """WITH a AS (
        |  SELECT c_nationkey, c_mktsegment FROM customer
        |  WHERE c_acctbal > 5000
        |), b AS (
        |  SELECT c_nationkey, c_mktsegment FROM customer
        |  WHERE c_acctbal > 7500
        |)
        |SELECT *, 'intersect_all' AS op FROM (
        |  SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT *, 'except_all' AS op FROM (
        |  SELECT * FROM a EXCEPT ALL SELECT * FROM b)""".stripMargin,

    "o8_null_ordering" ->
      """SELECT event_id,
        |  CASE WHEN event_id < 7 THEN NULL ELSE value END AS v
        |FROM events
        |ORDER BY v DESC NULLS FIRST, event_id
        |LIMIT 20""".stripMargin,

    // o9: the transposed frame rebuilt explicitly — one UNION ALL arm
    // per metric row, one conditional-MAX cell per event type
    "o9_transpose" ->
      """WITH a AS (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    ROUND(CAST(SUM(CAST(ROUND(value * 1e2, 0) AS BIGINT))
        |      AS DOUBLE) / 1e2, 2) AS sum_value,
        |    CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
        |  FROM events GROUP BY 1
        |)
        |SELECT 'n' AS key,
        |  MAX(CASE WHEN event_type = 'click' THEN n END) AS click,
        |  MAX(CASE WHEN event_type = 'error' THEN n END) AS error,
        |  MAX(CASE WHEN event_type = 'purchase' THEN n END) AS purchase,
        |  MAX(CASE WHEN event_type = 'signup' THEN n END) AS signup,
        |  MAX(CASE WHEN event_type = 'view' THEN n END) AS view
        |FROM a
        |UNION ALL
        |SELECT 'sum_value',
        |  MAX(CASE WHEN event_type = 'click' THEN sum_value END),
        |  MAX(CASE WHEN event_type = 'error' THEN sum_value END),
        |  MAX(CASE WHEN event_type = 'purchase' THEN sum_value END),
        |  MAX(CASE WHEN event_type = 'signup' THEN sum_value END),
        |  MAX(CASE WHEN event_type = 'view' THEN sum_value END)
        |FROM a
        |UNION ALL
        |SELECT 'n_users',
        |  MAX(CASE WHEN event_type = 'click' THEN n_users END),
        |  MAX(CASE WHEN event_type = 'error' THEN n_users END),
        |  MAX(CASE WHEN event_type = 'purchase' THEN n_users END),
        |  MAX(CASE WHEN event_type = 'signup' THEN n_users END),
        |  MAX(CASE WHEN event_type = 'view' THEN n_users END)
        |FROM a""".stripMargin
  )
}
