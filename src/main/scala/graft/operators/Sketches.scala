package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.functions._

/** Probabilistic sketch operators beyond HLL (a4) and GK quantiles
  * (a8b): bloom-filter membership and count-min frequency — the
  * constant-memory summaries a 100 TB pipeline uses where exact
  * structures can't fit (e.g. "was this doc_id seen in yesterday's
  * crawl" across billions of keys).
  *
  * Sketch internals are seed-dependent, so these are rows-only queries;
  * SketchSpec pins the guarantees that matter: bloom → zero false
  * negatives, count-min → never under-counts.
  */
object Sketches {

  val queries: Map[String, Q] = Map(
    // K1: bloom-filter semi-join — build a bloom over customers with
    // accounts in good standing, probe the orders fact side. The
    // classic shuffle-free pre-filter: ship a few MB instead of
    // shuffling the fact table for an exact semi join.
    "k1_bloom_prefilter" -> ((s, d) => {
      val goodCustomers = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0)
      val bloom = goodCustomers.stat.bloomFilter("c_custkey", 100000, 0.01)
      // native codegen'd probe (Spark's own BloomFilterMightContain) —
      // a Scala UDF here would break whole-stage codegen on the fact scan
      Tables.orders(s, d)
        .filter(graft.functions.SketchOps.bloomMightContain(bloom, col("o_custkey")))
        .agg(count(lit(1)).as("n_candidates"))
    }),

    // K2: count-min frequency estimates for event types (exact at this
    // cardinality; the point is the constant-memory API surface).
    "k2_countmin_freq" -> ((s, d) => {
      import s.implicits._
      val cms = Tables.events(s, d)
        .stat.countMinSketch(col("event_type"), eps = 0.001,
          confidence = 0.99, seed = 42)
      Seq("click", "view", "purchase", "signup", "error")
        .map(t => (t, cms.estimateCount(t)))
        .toDF("event_type", "est_count")
    }),

    // K3: MERGEABLE distinct-count sketches (DataSketches HLL via
    // Spark's hll_sketch_agg/hll_union_agg) — the property that makes
    // sketches a 100 TB primitive: per-partition/per-day sketches are
    // small persistable BINARY values, and ANY date-range distinct-user
    // question is answered later by merging them, never rescanning the
    // fact data. The query materializes per-(event_type, day) sketches,
    // then answers the per-type question by UNION — exactly the rollup
    // a warehouse would persist. SketchSpec pins the algebra: merged
    // estimate ≡ whole-data estimate, and within HLL error of exact.
    "k3_hll_merge" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      daily.groupBy(col("event_type"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
          .as("est_users"))
    }),

    // K7: SKETCHED ROLLING DISTINCT (r12) — w13's approximate twin,
    // completing the exact/sketch pairing for the rolling-window class
    // (a3/a4 pair it for plain distinct, k4/a8 for quantiles, k6/a14
    // for frequency). One HLL sketch per day (key-sized), then each
    // day's sketch REPLICATED to the ≤7 report days it covers and
    // unioned per report day — at 100 TB the fact table is touched
    // once; the rolling union runs over days × 7 sketches of ~KB each,
    // which is the entire point: w13's exact form must rescan the
    // (user, day) grid, this one re-aggregates nothing. Rows-only by
    // necessity (estimates have no SQL oracle); SketchSpec pins the
    // estimate within the HLL error band of w13's exact answer for
    // every day.
    "k7_rolling_distinct_hll" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day_no"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      daily
        .select(explode(expr("sequence(day_no, day_no + 6)")).as("day_no"),
          col("sk"))
        .groupBy(col("day_no"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("au7_est"))
        .join(daily.select(col("day_no")), Seq("day_no"), "left_semi")
    }),

    // K4: MERGEABLE QUANTILE sketches — k3's pattern for quantiles,
    // which Spark itself cannot do (percentile_approx's digest is not a
    // storable/unionable value): per-(event_type, day) KLL sketches of
    // `value`, then per-type p50/p95 by UNIONING the daily sketches —
    // the persisted rollup that answers any date-range latency-quantile
    // question without rescanning the fact table. Native
    // TypedImperativeAggregates (graft.functions.KllSketch*): the
    // buffer is the sketch object, serialized only at shuffle
    // boundaries; partial aggregation collapses map-side. SketchSpec
    // pins the KLL rank-error bound vs exact quantiles and that the
    // union preserves the total weight.
    "k4_kll_quantile_merge" -> ((s, d) => {
      import graft.functions.SketchOps._
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(kllSketchAgg(col("value")).as("sk"))
      daily.groupBy(col("event_type"))
        .agg(kllUnionAgg(col("sk")).as("merged"))
        .select(col("event_type"),
          kllQuantile(col("merged"), 0.5).as("p50"),
          kllQuantile(col("merged"), 0.95).as("p95"))
    }),

    // K6: mergeable HEAVY HITTERS — "which keys are hot" from one pass
    // + per-day summary merges, the question a 100 TB planner asks
    // BEFORE committing to a join strategy (salt or not, broadcast or
    // not): per-day frequent-items sketches of user_id, unioned, then
    // the users provably reaching 80 events extracted with
    // NO_FALSE_POSITIVES bounds. The fixture's ≤1.5k active keys never
    // purge the 1024-slot map, so estimates are EXACT and the entry is
    // hash-checked against DuckDB's exact GROUP BY/HAVING (1/13/104
    // heavy hitters at the three sfs); at 100 TB the same plan degrades
    // to the N·(3.5/m) bound — SketchSpec owns that purge-regime law.
    "k6_freq_heavy_hitters" -> ((s, d) => {
      import graft.functions.SketchOps._
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(freqSketchAgg(col("user_id")).as("sk"))
      daily.agg(freqUnionAgg(col("sk")).as("m"))
        .select(explode(freqTopItems(col("m"), lit(80L))).as("r"))
        .select(col("r.item").as("user_id"), col("r.n").as("n_events"))
    }),

    // K5: theta distinct-count sketches with SET ALGEBRA — the overlap
    // question HLL (k3) cannot answer from stored summaries: "how many
    // users BOTH clicked and purchased, and how many only clicked",
    // computed entirely over per-(type, day) persisted sketches (union
    // → intersect → a-not-b), never by rejoining the fact table. Theta
    // updates are pure hashing (no RNG) and below the lgK=12 nominal-
    // entries cap the sketch is in EXACT mode — the fixture's ≤1.5k
    // distinct users keep every estimate equal to the true count, so
    // unlike k1–k4 this sketch entry IS hash-checked against DuckDB's
    // exact distinct joins; at 100 TB the same plan degrades to ±1.6%
    // bounds, the law SketchSpec owns on a 100k-key planted domain.
    "k5_theta_set_ops" -> ((s, d) => {
      import graft.functions.SketchOps._
      val daily = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(thetaSketchAgg(col("user_id")).as("sk"))
      val byType = daily.groupBy(col("event_type"))
        .agg(thetaUnionAgg(col("sk")).as("sk"))
      val c = byType.filter(col("event_type") === "click")
        .select(col("sk").as("a"))
      val p = byType.filter(col("event_type") === "purchase")
        .select(col("sk").as("b"))
      c.crossJoin(p).select(
        round(thetaEstimate(col("a")))
          .cast(org.apache.spark.sql.types.LongType).as("n_click"),
        round(thetaEstimate(col("b")))
          .cast(org.apache.spark.sql.types.LongType).as("n_purchase"),
        round(thetaEstimate(thetaIntersect(col("a"), col("b"))))
          .cast(org.apache.spark.sql.types.LongType).as("n_both"),
        round(thetaEstimate(thetaANotB(col("a"), col("b"))))
          .cast(org.apache.spark.sql.types.LongType).as("n_click_only"))
    })
  )

  /** k1–k4 have no SQL oracles — their guarantees live in SketchSpec.
    * k5 is the exception by construction: exact-mode theta estimates
    * equal true counts, so the set-algebra surface is hash-checked
    * against DuckDB's exact distinct joins at every fixture sf.
    */
  val oracles: Map[String, String] = Map(
    "k6_freq_heavy_hitters" ->
      """SELECT user_id, COUNT(*) AS n_events
        |FROM events GROUP BY user_id HAVING COUNT(*) >= 80""".stripMargin,

    "k5_theta_set_ops" ->
      """WITH c AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |)
        |SELECT (SELECT COUNT(*) FROM c) AS n_click,
        |  (SELECT COUNT(*) FROM p) AS n_purchase,
        |  (SELECT COUNT(*) FROM c JOIN p USING (user_id)) AS n_both,
        |  (SELECT COUNT(*) FROM c ANTI JOIN p USING (user_id))
        |    AS n_click_only""".stripMargin)
}
