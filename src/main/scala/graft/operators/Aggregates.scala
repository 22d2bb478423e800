package graft.operators

import graft.Exprs._
import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One lineitem row for the typed-API path (public for encoders). */
case class LineQty(l_returnflag: String, l_linestatus: String, l_quantity: Double)

/** Typed (sum, count) Aggregator for the a11 Dataset path. */
object SumCount extends org.apache.spark.sql.expressions.Aggregator[
    Double, (Double, Long), (Double, Long)] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + a, b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): (Double, Long) = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[(Double, Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong)
  override def outputEncoder: org.apache.spark.sql.Encoder[(Double, Long)] =
    bufferEncoder
}

/** Aggregation operators (SURVEY.md §2B A1–A8).
  *
  * All grouped aggregates rely on Spark's automatic partial+final hash
  * aggregation (map-side combine before the shuffle), so shuffle volume is
  * proportional to group cardinality, not input rows — the property that
  * makes these plans survive a 100 TB input.
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    // A1: ungrouped aggregate over lineitem (R6's count, widened).
    "a1_ungrouped_agg" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        davg(col("l_discount")).as("avg_disc"))
    }),

    // A2: TPC-H Q1 shape — grouped hash aggregate, 8 aggregates.
    "a2_group_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // products of 2-dp columns carry 4/6 fractional digits exactly
          lsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          lsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax")), 6)
            .as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // A3: exact COUNT(DISTINCT) per group.
    "a3_count_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // A4: HLL approximate distinct — no oracle (±rsd); rows-only check.
    "a4_approx_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
    }),

    // A5: rollup over the nation hierarchy with grouping() to tag levels.
    "a5_rollup" -> ((s, d) => {
      Tables.nation(s, d)
        .rollup(col("n_regionkey"), col("n_nationkey"))
        .agg(count(lit(1)).as("n"),
          grouping(col("n_regionkey")).cast(IntegerType).as("g_region"),
          grouping(col("n_nationkey")).cast(IntegerType).as("g_nation"))
    }),

    // A5b: cube — all grouping-set combinations over two dims.
    "a5b_cube" -> ((s, d) => {
      Tables.customer(s, d)
        .cube(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          grouping(col("c_nationkey")).cast(IntegerType).as("g_nation"),
          grouping(col("c_mktsegment")).cast(IntegerType).as("g_seg"))
    }),

    // A6: HAVING — post-aggregation filter on the aggregate value.
    // (r12: threshold 20 exceeded every sf0.001 group's count — an
    // empty, vacuous HAVING at the parity-gate SF; 14 keeps AND drops
    // groups at every fixture SF, so both branches stay live)
    "a6_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 14)
    }),

    // A7: collect_list, canonicalized to a sorted comma-joined string so
    // the accumulation order (nondeterministic under parallelism) can't
    // leak into the comparison.
    "a7_collect_list" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(array_join(array_sort(collect_list(col("o_orderkey"))), ",")
          .as("order_keys"))
    }),

    // A8: exact interpolated percentiles (matches DuckDB quantile_cont).
    "a8_percentiles" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
    }),

    // A19: ROBUST OUTLIER DETECTION via MAD (r14) — the data-quality
    // monitor mean/stddev can't provide (one wild value drags the mean
    // toward itself and inflates sigma until nothing is an outlier;
    // median and MAD have breakdown point 0.5): per event type, the
    // median, the median absolute deviation, and how many events sit
    // beyond the standard |v − med| > 3·1.4826·MAD fence (1.4826 scales
    // MAD to sigma under normality). Two grouped exact percentiles (the
    // a8 convention: `percentile` ≡ DuckDB's quantile_cont, identical
    // double interpolation) with a type-keyed broadcast join back —
    // per-type medians are group-cardinality-sized, so both extra
    // passes cost one scan each and no corpus-sized shuffle; the fence
    // COUNT is a partial agg. Outliers exist at every SF (the fixture's
    // value tail), so the fence predicate is live both ways.
    "a19_mad_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med_raw"))
      // med/mad round to 4dp BEFORE the fence (ADVICE r14): the fence
      // then compares identical doubles on both engines instead of each
      // engine's own last-ulp percentile interpolation
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(abs(value - med_raw), 0.5)"), 4).as("mad"),
          round(first(col("med_raw")), 4).as("med"))
      ev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          first(col("med")).as("med"),
          first(col("mad")).as("mad"),
          sum(when(abs(col("value") - col("med")) >
            lit(3) * lit(1.4826) * col("mad"), 1L).otherwise(0L))
            .cast(LongType).as("n_outliers"))
    }),

    // A8b: approximate percentile (GK sketch) — returns a member of the
    // input, not an interpolation, so no SQL oracle; rows-only + spec.
    "a8b_approx_percentile" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"))
    }),

    // A11: the typed Dataset path — case-class Encoder, groupByKey + a
    // typed Aggregator (compile-time field checks; Tungsten rows
    // underneath). The Aggregator matters at scale: it aggregates
    // PARTIALLY before the shuffle (object-hash agg), so ~6 buffer rows
    // per map task cross the wire — the round-4 mapGroups formulation
    // shipped every input row to the reduce side (0.97 s → ~0.3 s at
    // sf0.1, and the difference is the whole fact table at 100 TB).
    // Quantities are integral doubles, so the fold is order-independent.
    "a11_typed_groupbykey" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .as[LineQty]
        .groupByKey(r => (r.l_returnflag, r.l_linestatus))
        // mapValues before the shuffle: the two key strings already ride
        // in the key tuple, so the buffer payload is the one double
        // actually aggregated
        .mapValues(_.l_quantity)
        .agg(SumCount.toColumn.name("sc"))
        // flatten with column ops, not a typed .map — the latter would
        // pay one more full encoder round-trip just to rename fields
        .select(col("key._1").as("l_returnflag"), col("key._2").as("l_linestatus"),
          col("sc._1").as("sum_qty"), col("sc._2").as("n_rows"))
    }),

    // A9: custom typed Aggregator (geometric mean). Rounded to 4dp: the
    // log-sum is order-dependent in the last ulps and DuckDB's libm may
    // differ from the JVM's — the relative error is ~1e-12, far inside
    // the rounding guard.
    // A18: BOUNDED TOP-K AGGREGATE (r14) — top-3 orders per customer
    // via the k-bounded partial-aggregating buffer ([[graft.functions
    // .TopKLong]], the same kernel family l3/l6 ship) instead of w5's
    // window rank: the window form shuffles and sorts EVERY row inside
    // each key; this form's map-side combine bounds what leaves a task
    // to k rows per (customer, partition) — the shape that makes
    // top-k-per-entity survive a trillion-row fact table. The
    // (cents desc, orderkey asc) order is total, so partial-merge order
    // cannot change the result and the hash pins it exactly.
    "a18_topk_heap" -> ((s, d) => {
      val topk = udaf(new graft.functions.TopKLong(3))
      Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("CAST(ROUND(o_totalprice * 1e2, 0) AS BIGINT)").as("cents"),
          col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(topk(col("cents"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"),
          posexplode(col("top")).as(Seq("pos", "it")))
        .select(col("o_custkey"), (col("pos") + 1).cast(IntegerType).as("rank"),
          col("it._2").as("o_orderkey"), col("it._1").as("cents"))
    }),

    "a9_custom_udaf" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(round(graft.functions.GeoMean.column(col("o_totalprice")), 4)
          .as("geo_mean_price"))
    }),

    // A13: ARGMAX/ARGMIN aggregates — max_by/min_by, the "row that won"
    // pattern (most expensive order's key per segment, first order's
    // date) that otherwise costs a window + rank filter. One hash
    // aggregate. The ordering value is a (price, key) STRUCT, not the
    // bare price: a price tie at the group extreme would otherwise make
    // the winning key nondeterministic (partial-agg merge order), and
    // determinism must come from the QUERY, not from hoping the fixture
    // stays tie-free at every scale factor (ADVICE r9). The struct
    // compares lexicographically and the key is unique, so ties cannot
    // exist; the oracle mirrors it with DuckDB's struct-ordered
    // max/min + field extract.
    "a13_minmax_by" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_order"),
          max(col("o_totalprice")).as("top_price"))
    }),

    // A14: MODE — per-group most-frequent value, with the tie broken
    // DETERMINISTICALLY toward the smallest value (the built-in mode()
    // returns an arbitrary tied winner, which can't hash-compare):
    // count per (group, value), then min_by over the (-count, value)
    // struct = max count, then min value. Two hash aggregates, both
    // partial-agg map-side; the DuckDB twin uses the same struct-ordered
    // min + field extract as a13.
    "a14_mode" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(
          min_by(col("event_type"),
            struct((-col("cnt")).as("nc"), col("event_type"))).as("mode_type"),
          max(col("cnt")).as("mode_cnt"))
    }),

    // A15: WEIGHTED MEDIAN — the smallest value whose cumulative weight
    // reaches half the group's total (lower weighted median; here
    // l_quantity weighted by revenue — "the quantity at which half the
    // money sits at or below"). Spark ships no weighted percentile, and
    // the naive form (sort every row, scan for the crossing) serializes
    // each group onto one task. This plan collapses FIRST: one
    // partial-agg groupBy on (group, value) — l_quantity has ~50
    // distinct values, so a 100 TB fact reduces map-side to a
    // |groups|×|values| grid — then the cumulative/total-weight windows
    // run over that key-sized grid, never the corpus. Weights are
    // exact scaled longs (order-free), so the crossing row — and the
    // hash — is deterministic cross-engine.
    "a15_weighted_median" -> ((s, d) =>
      weightedMedian(Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            col("l_quantity"),
            slong(col("l_extendedprice"), 2).as("w")),
        "l_returnflag", "l_quantity")
        .withColumn("total_weight",
          (col("total_weight").cast(DoubleType) / 100.0))),

    // A16: HISTOGRAM — the fixed-grid distribution summary dashboards
    // and data-profiling passes draw (equi-width buckets over value,
    // count + exact mass per bucket). Bucketing is integer floor
    // division on the scaled-long value (exact, engine-neutral — no
    // float boundary can disagree), and the whole thing is one
    // partial-agg groupBy: bucket cardinality is fixed by the grid, so
    // the shuffle is ~20 rows at any corpus size.
    // The WHERE value >= 0 guard is load-bearing for cross-engine
    // equivalence, not just fixture hygiene: Spark `div` truncates
    // toward zero while DuckDB `//` floors, and they diverge on
    // negative operands — the guard makes the domain where they agree
    // EXPLICIT on both sides instead of an assumed fixture invariant
    // (ADVICE r11).
    // A17: conditional/boolean aggregate family (r13) — count_if,
    // bool_and, bool_or: the data-quality assertion aggregates ("does
    // every row in this cohort satisfy X, does any"). Grouped by a
    // 50-bucket key so every aggregate is LIVE both ways at both SFs:
    // the bool_and threshold sits just under the price cap (a bucket is
    // false iff it drew a >499k order — a handful per SF), the bool_or
    // event is the rare sub-5k order, count_if splits mid-range. All
    // single-pass partial+final aggregates; the grouped shuffle is
    // 50 rows at any corpus size.
    "a17_conditional_aggs" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy((col("o_custkey") % 50).as("bucket"))
        .agg(expr("count_if(o_totalprice > 300000)").as("n_big"),
          expr("bool_and(o_totalprice < 499000)").as("all_under_cap"),
          expr("bool_or(o_totalprice < 5000)").as("has_tiny"),
          count(lit(1)).as("n"))
    }),

    "a16_histogram" -> ((s, d) => {
      Tables.events(s, d)
        .where(col("value") >= 0)
        .groupBy(expr("CAST(ROUND(value * 1e2, 0) AS BIGINT) div 2500")
          .as("bucket")) // 25.00-wide buckets
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("bucket_mass"))
    }),

    // A12: statistical aggregate family — sample stddev/variance and the
    // two-column moments (correlation, covariance) over the price/
    // quantity pair. All single-pass partial+final aggregates (Spark's
    // moment buffers merge associatively), rounded to 4dp before the
    // cross-engine compare like every floating aggregate.
    "a12_stats_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(var_samp(col("l_extendedprice")), 4).as("var_price"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 4)
            .as("covar_pq"))
    })
  )

  /** a15's kernel: lower weighted median per group over a frame carrying
    * (groupCol, valueCol, w) with `w` an exact LONG weight — the smallest
    * value whose cumulative weight reaches half the group total. The
    * cumulative/total windows run over the (group, value)-collapsed grid
    * (one partial-agg groupBy first), never the raw rows; exposed for
    * PropertySpec's brute-force law.
    */
  private[graft] def weightedMedian(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String, valueCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(groupCol), col(valueCol))
      .agg(sum(col("w")).as("w"))
    val wc = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col(groupCol))
    g.select(col(groupCol), col(valueCol),
        sum(col("w")).over(wc).as("cw"),
        sum(col("w")).over(wt).as("tw"))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("w_median"),
        min(col("tw")).as("total_weight"))
  }

  val oracles: Map[String, String] = Map(
    "a1_ungrouped_agg" ->
      s"""SELECT COUNT(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty,
         |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
         |  ${sqlDavg("l_discount")} AS avg_disc
         |FROM lineitem""".stripMargin,

    "a2_group_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlLsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
         |  ${sqlLsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "a3_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,

    "a5_rollup" ->
      """SELECT n_regionkey, n_nationkey, COUNT(*) AS n,
        |  CAST(GROUPING(n_regionkey) AS INT) AS g_region,
        |  CAST(GROUPING(n_nationkey) AS INT) AS g_nation
        |FROM nation GROUP BY ROLLUP(n_regionkey, n_nationkey)""".stripMargin,

    "a5b_cube" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
        |  CAST(GROUPING(c_nationkey) AS INT) AS g_nation,
        |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg
        |FROM customer GROUP BY CUBE(c_nationkey, c_mktsegment)""".stripMargin,

    "a6_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) > 14""".stripMargin,

    "a7_collect_list" ->
      """SELECT o_custkey,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "a11_typed_groupbykey" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    // a19: same two-level median/MAD recompute; quantile_cont is the
    // established percentile() twin. med/mad round to 4dp BEFORE the
    // fence (ADVICE r14) so both engines compare identical doubles —
    // the raw interpolations differ in the last ulp and a point within
    // an ulp of the fence could otherwise flip the count
    "a19_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med_raw
        |  FROM events GROUP BY 1
        |), mad AS (
        |  SELECT e.event_type,
        |    ROUND(quantile_cont(abs(e.value - m.med_raw), 0.5), 4) AS mad,
        |    ROUND(ANY_VALUE(m.med_raw), 4) AS med
        |  FROM events e JOIN med m USING (event_type) GROUP BY 1
        |)
        |SELECT e.event_type, COUNT(*) AS n,
        |  ANY_VALUE(a.med) AS med,
        |  ANY_VALUE(a.mad) AS mad,
        |  CAST(SUM(CASE WHEN abs(e.value - a.med) >
        |    3 * 1.4826 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN mad a USING (event_type)
        |GROUP BY 1""".stripMargin,

    // a18: the window-rank recompute of the same total order — any
    // heap insert/merge/trim bug diverges on some (customer, rank)
    "a18_topk_heap" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROUND(o_totalprice * 1e2, 0) AS BIGINT) AS cents,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(ROUND(o_totalprice * 1e2, 0) AS BIGINT) DESC,
        |               o_orderkey) AS rn
        |  FROM orders
        |)
        |SELECT o_custkey, CAST(rn AS INT) AS rank, o_orderkey, cents
        |FROM r WHERE rn <= 3""".stripMargin,

    "a9_custom_udaf" ->
      """SELECT o_orderpriority,
        |  ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geo_mean_price
        |FROM orders WHERE o_totalprice > 0
        |GROUP BY o_orderpriority""".stripMargin,

    "a8_percentiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type""".stripMargin,

    "a13_minmax_by" ->
      """SELECT o_orderpriority,
        |  (max({'p': o_totalprice, 'k': o_orderkey})).k AS top_order,
        |  (min({'p': o_totalprice, 'k': o_orderkey})).k AS cheapest_order,
        |  MAX(o_totalprice) AS top_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "a14_mode" ->
      """SELECT user_id,
        |  (min({'nc': -cnt, 'v': event_type})).v AS mode_type,
        |  MAX(cnt) AS mode_cnt
        |FROM (SELECT user_id, event_type, COUNT(*) AS cnt
        |      FROM events GROUP BY 1, 2)
        |GROUP BY user_id""".stripMargin,

    // a16: `//` = DuckDB integer floor div ≡ Spark `div` ONLY on
    // non-negative operands — the WHERE guard pins that domain on both
    // sides rather than assuming it of the fixture
    "a17_conditional_aggs" ->
      """SELECT o_custkey % 50 AS bucket,
        |  COUNT(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
        |  bool_and(o_totalprice < 499000) AS all_under_cap,
        |  bool_or(o_totalprice < 5000) AS has_tiny,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "a16_histogram" ->
      """SELECT CAST(ROUND(value * 1e2, 0) AS BIGINT) // 2500 AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 1e2, 0) AS BIGINT)) AS DOUBLE) / 1e2
        |    AS bucket_mass
        |FROM events WHERE value >= 0 GROUP BY 1""".stripMargin,

    "a15_weighted_median" ->
      """WITH g AS (
        |  SELECT l_returnflag, l_quantity,
        |    SUM(CAST(ROUND(l_extendedprice * 1e2, 0) AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2
        |), c AS (
        |  SELECT l_returnflag, l_quantity,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM g
        |)
        |SELECT l_returnflag, MIN(l_quantity) AS w_median,
        |  CAST(MIN(tw) AS DOUBLE) / 1e2 AS total_weight
        |FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag""".stripMargin,

    "a12_stats_agg" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  ROUND(var_samp(l_extendedprice), 4) AS var_price,
        |  ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
        |  ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS covar_pq
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
