package graft.functions

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families (SURVEY.md §2B F1–F10), one oracle query per
  * family. Everything is `org.apache.spark.sql.functions` built-ins —
  * codegen'd, no UDFs — so each projection stays inside a single
  * WholeStageCodegen span over the parquet scan.
  *
  * Determinism notes: libm results (sqrt/ln/exp/pow) are rounded to 6dp
  * because JVM StrictMath vs DuckDB's C libm can differ in the final ulp;
  * all other families are exact.
  */
object ScalarFns {

  val queries: Map[String, Q] = Map(
    // F23: Z-ORDER KEY (r17) — the Morton bit-interleave of two BIGINT
    // keys (functions/ZOrder.scala), the clustering key behind
    // OPTIMIZE … ZORDER BY and m40b's clustered compaction. A native
    // codegen'd Expression (no UDF): five shift-mask rounds per input
    // inside whole-stage codegen over the scan. The entry emits the
    // key for (custkey, orderkey) pairs; the oracle replays the
    // identical shift-mask pipeline in SQL, pinning the construction
    // bit-for-bit (ZOrderSpec owns the inverse/locality/codegen laws).
    // Scan-local at any scale — this is the map-side key the
    // compaction shuffle sorts by.
    "f23_zorder" -> ((s, d) => {
      val z = ZOrderLong.zorder(col("o_custkey"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_custkey"), z.as("zval"))
    }),

    // F23B (r17): N-LANE Z-ORDER KEY — the 3-dimension Morton
    // interleave (functions/ZOrder.scala ZOrderN: 20 bits per lane at
    // n=3, the key behind OPTIMIZE … ZORDER BY (a, b, c)). Same
    // codegen'd scan-local projection as f23; the oracle replays the
    // bit-by-bit interleave with a generate_series fold — disjoint
    // bit positions make SUM the OR. ZOrderSpec pins n=2 ≡ the dyadic
    // shift-mask construction and the naive reference at every n.
    "f23b_zorder_n" -> ((s, d) => {
      val z = ZOrderN.zorderN(col("o_custkey"), col("o_orderkey"),
        expr("CAST(year(o_orderdate) AS BIGINT)"))
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
          z.as("zval"))
    }),

    // F1: string family over part names.
    "f1_string_fns" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 5).as("name5"),
        upper(col("p_name")).as("name_up"),
        lower(col("p_type")).as("type_lo"),
        length(col("p_name")).as("name_len"),
        trim(lit("  pad  ")).as("trimmed"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        translate(col("p_name"), " ", "-").as("dashed"))
    }),

    // F2: date/time family over order dates.
    "f2_datetime_fns" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(lit("2000-01-01").cast(DateType), col("o_orderdate").cast(DateType)).as("days_to_2k"),
        date_format(date_add(col("o_orderdate").cast(DateType), 30), "yyyy-MM-dd").as("plus30"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("formatted"))
    }),

    // F3: math family over prices (libm outputs rounded, see scaladoc).
    "f3_math_fns" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        round(col("o_totalprice"), 1).as("rounded"),
        floor(col("o_totalprice")).as("floored"),
        ceil(col("o_totalprice")).as("ceiled"),
        abs(col("o_totalprice") - 100000).as("abs_delta"),
        round(sqrt(col("o_totalprice")), 6).as("sq"),
        round(log(col("o_totalprice")), 6).as("ln_p"),
        round(exp(col("o_totalprice") / 100000), 6).as("exp_p"),
        round(pow(col("o_totalprice"), 0.5), 6).as("pow_half"),
        pmod(col("o_orderkey"), lit(7)).as("mod7"),
        signum(col("o_totalprice") - 100000).as("sign_delta"))
    }),

    // F4: conditional / null family.
    "f4_conditional_fns" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)")).as("seg_or"),
        nvl(nullif(col("c_name"), col("c_name")), lit("anon")).as("nvl_name"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap"))
    }),

    // F5: array family over document token lists.
    "f5_array_fns" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          array_contains(col("toks"), "spark").as("has_spark"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          array_join(slice(col("toks"), 1, 3), " ").as("first3"),
          element_at(col("toks"), -1).as("last_tok"),
          element_at(array_sort(col("toks")), 1).as("min_tok"),
          size(flatten(array(col("toks"), col("toks")))).as("n_doubled"))
    }),

    // F6: map family — events.props JSON parsed into MAP<STRING,INT>.
    "f6_map_fns" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), ",").as("keys"),
          element_at(col("m"), "k").as("k_val"),
          size(col("m")).as("n_entries"))
    }),

    // F7: JSON family straight over the props string.
    "f7_json_fns" -> ((s, d) => {
      // fanOut BEFORE the parse projection (the s16 fix): events is one
      // parquet split at fixture scale, so the JSON parse ran as a
      // single ~1 s CPU task on an idle 32-core session. Identity at
      // scale — a multi-split scan already fans out.
      Tables.fanOut(Tables.events(s, d)
          .select(col("event_id"), col("props"), col("user_id")),
        col("event_id")).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k_int"),
        to_json(struct(col("user_id").as("u"))).as("user_json"))
    }),

    // F15: HIGHER-ORDER FUNCTIONS — the lambda family (transform /
    // filter / exists / forall / aggregate / zip_with) as a first-class
    // surface (l5/l15 use these internally; this pins the family
    // itself). All six stay inside whole-stage codegen — the reason
    // they, not UDFs, are the engine's answer to per-row collection
    // logic at 100 TB. zip_with is exercised as a dot product of the
    // token-length vector with its reverse (integer-valued doubles —
    // exact cross-engine).
    "f15_higher_order" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
            .as("sum_len"),
          expr("size(filter(toks, t -> length(t) > 4))").as("n_long"),
          expr("exists(toks, t -> t = 'spark')").as("has_spark"),
          expr("forall(toks, t -> length(t) > 0)").as("all_nonempty"),
          expr("""aggregate(
                    zip_with(transform(toks, t -> CAST(length(t) AS DOUBLE)),
                             reverse(transform(toks, t -> CAST(length(t) AS DOUBLE))),
                             (a, b) -> a * b),
                    0D, (acc, x) -> acc + x)""").as("len_dot_rev"))
    }),

    // F16: REGEXP-EXTRACT family — multi-match extraction over text
    // (regexp_extract_all / the counting form / the single-group form),
    // completing the regex surface f1's replace/like leave open. Both
    // engines run the same pattern text; basic classes + greedy
    // quantifiers behave identically under Java regex and RE2 (no
    // lookaround, no flags). Patterns target the fixture's actual
    // vocabulary (lowercase words — r12: the original digit-class
    // patterns matched NOTHING in the fixture, a vacuous pin; and the
    // raw array output crashed the driver canonicalizer, hence the f5
    // array_join convention). All per-row in the scan, zero shuffle.
    "f16_regexp_extract" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        expr("""array_join(regexp_extract_all(text, '[a-z]{6,}', 0), ' ')""")
          .as("long_toks"),
        expr("""size(regexp_extract_all(text, '[a-z]*a[a-z]*', 0))""")
          .as("n_a_toks"),
        regexp_extract(col("text"), "([a-z]+)le", 1)
          .as("first_le_stem"))
    }),

    // F17: DECIMAL(12,2) END TO END — the declared money type (§1.2)
    // exercised as exact fixed-point arithmetic, not the scaled-long
    // detour: cast → multiply → ROUND (HALF_UP in both engines, pinned
    // empirically on literal ties 1.005/2.675) → subtract → SUM/MAX.
    // The decimal is DERIVED from the scaled-long cents convention
    // (exact in both engines) rather than a raw double→decimal cast,
    // whose tie-breaking differs between Spark's shortest-repr
    // BigDecimal and DuckDB's multiply-and-round. Every decimal result
    // is cast to an EXPLICIT final type then STRING: engines disagree
    // on result precision/scale inference (Spark SUM(DECIMAL(12,2)) →
    // (22,2), DuckDB → (38,2)), but the digits must match exactly —
    // the string pins them. ANSI posture: Spark 4 defaults
    // spark.sql.ansi.enabled=true, so decimal overflow would THROW
    // rather than null out — matching DuckDB, which always errors on
    // overflow; the explicit final precisions here are sized so the
    // fixture can never reach either behavior (SUM of 15k values ≤
    // 10^10 cents fits DECIMAL(18,2) with 6 digits of headroom). All
    // arithmetic is codegen'd UnsafeRow Decimal ops; the groupBy is
    // one partial-agg shuffle on o_custkey.
    // F20: the try_* error-safe family (r13) — Spark 4 runs ANSI mode by
    // default, so division by zero, bad casts, and arithmetic overflow
    // FAIL queries that silently returned NULLs on Spark 3; try_divide /
    // try_cast / try_add are the production migration surface (keep the
    // strictness, opt into NULL where the pipeline tolerates dirt).
    // Every function is LIVE both ways at every SF: the divisor is 0 on
    // ~1/7 of rows, the cast input is a digit except on ~1/3 of rows
    // (a deterministic 'x' suffix), the add overflows on custkey % 500
    // == 0 (~0.2% — try_* implements the NULL path by CATCHING the ANSI
    // exception per failing row, so the failure rate IS the cost model:
    // a 50% overflow rate measured 3.6 s at sf0.1 vs 0.2 s at 0.2%;
    // real dirty data fails at the tail rate, not half the corpus).
    // The oracle re-expresses each as the explicit CASE/TRY_CAST DuckDB
    // form — same NULL sites, same surviving values.
    "f20_try_functions" -> ((s, d) => {
      // fanOut: single-split scan ran the try-expression projection as
      // one ~0.8 s CPU task (the s16/f7 pattern; identity at scale)
      Tables.fanOut(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderpriority")),
        col("o_orderkey")).select(
        col("o_orderkey"),
        round(expr(
          "try_divide(CAST(ROUND(o_totalprice * 1e2, 0) AS BIGINT), o_custkey % 7)"),
          6).as("safe_div"),
        expr("""try_cast(concat(substring(o_orderpriority, 1, 1),
                |CASE WHEN o_custkey % 3 = 0 THEN 'x' ELSE '' END) AS INT)"""
          .stripMargin).as("prio_num"),
        expr("""try_add(o_orderkey,
                |CASE WHEN o_custkey % 500 = 0 THEN 9223372036854775807
                |     ELSE CAST(0 AS BIGINT) END)""".stripMargin).as("safe_add"))
    }),

    // F21: the INTERVAL type family (r14) — SURVEY §1.2 declares
    // intervals in the data model; this exercises them the way f17 does
    // decimals: make_dt_interval / make_ym_interval construction,
    // timestamp ± interval in both flavors, interval × integer scaling,
    // and field EXTRACTion from a timestamp difference. Every output is
    // a timestamp or BIGINT (the intervals live in the computation, so
    // the artifact stays engine-neutral); DuckDB re-expresses each with
    // INTERVAL literals. Pure scan-local codegen at any scale. The
    // year-month add crosses month-length boundaries on the fixture's
    // random dates, pinning both engines' clamp-to-month-end rule.
    // F22: ORDERED STRING AGGREGATION (r14) — listagg WITHIN GROUP
    // (Spark 4's ANSI form of string_agg), the report/export surface
    // every BI layer leans on. Determinism REQUIRES the WITHIN GROUP
    // order (an unordered listagg is partitioning-dependent and could
    // never hash-check); the explicit (lang, doc_id) order makes both
    // engines emit the identical concatenation. Per-group state is the
    // group's own strings — the a7/w15 per-entity bound; the id list is
    // capped per group (top-8 by doc_id via the l6 partial top-k shape)
    // so row width stays bounded at any corpus size.
    "f22_listagg" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("source"), col("lang"), col("doc_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 8)
        .groupBy(col("source"))
        .agg(
          expr("listagg(lang, '|') WITHIN GROUP (ORDER BY lang, doc_id)")
            .as("langs"),
          expr("listagg(CAST(doc_id AS STRING), ',') WITHIN GROUP (ORDER BY doc_id)")
            .as("first_ids"))
    }),

    "f21_interval_arith" -> ((s, d) => {
      Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0).select(
        col("o_orderkey"),
        expr("o_orderdate + make_dt_interval(3, 12, 30, 0)").as("due_ts"),
        expr("o_orderdate + make_ym_interval(1, 6)").as("anniversary"),
        expr("o_orderdate - make_dt_interval(0, 6, 0, 0)").as("cutoff_ts"),
        expr("o_orderdate + make_dt_interval(0, 0, 45, 0) * (o_orderkey % 4)")
          .as("staggered_ts"),
        expr("""CAST(EXTRACT(DAY FROM (o_orderdate
               |  - TIMESTAMP '1995-01-01 00:00:00')) AS BIGINT)""".stripMargin)
          .as("age_days"))
    }),

    "f17_decimal_math" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("""CAST(CAST(CAST(ROUND(o_totalprice * 1e2, 0) AS BIGINT)
                 |  AS DECIMAL(14,2)) * CAST(0.01 AS DECIMAL(3,2))
                 |  AS DECIMAL(12,2))""".stripMargin).as("p"))
        .select(col("o_custkey"), col("p"),
          expr("CAST(ROUND(p * CAST(0.0725 AS DECIMAL(6,4)), 2) AS DECIMAL(12,2))")
            .as("tax"))
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          expr("CAST(CAST(SUM(p) AS DECIMAL(18,2)) AS STRING)").as("sum_p"),
          expr("CAST(CAST(SUM(tax) AS DECIMAL(18,2)) AS STRING)").as("sum_tax"),
          expr("CAST(CAST(MAX(p - tax) AS DECIMAL(18,2)) AS STRING)").as("max_net"))
    }),

    // F18: MAP HIGHER-ORDER FUNCTIONS — transform_keys /
    // transform_values / map_filter / map_zip_with, the lambda surface
    // f15 (array HOFs) and f6 (map read fns) left open. DuckDB has no
    // map lambdas, so the oracle recomputes each transformed map's
    // to_json rendering by string construction from the same scalar
    // inputs — the hash pins entry ORDER (Spark map HOFs preserve it;
    // map_zip_with emits m1's keys then m2-only keys) as well as
    // values. Map values ride as BIGINT so to_json renders bare
    // numbers identically. Per-row in the scan, zero shuffle, all four
    // HOFs codegen-friendly catalyst builtins.
    "f18_map_hof" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("map('chars', n_chars, 'words', CAST(size(split(text, ' ')) AS BIGINT))")
            .as("m"))
        .select(
          col("doc_id"),
          expr("to_json(transform_values(m, (k, v) -> v * 2))").as("doubled"),
          expr("""to_json(transform_keys(m,
                 |  (k, v) -> concat(k, '_', CAST(v % 10 AS STRING))))""".stripMargin)
            .as("rekeyed"),
          expr("to_json(map_filter(m, (k, v) -> v % 2 = 0))").as("evens"),
          expr("""to_json(map_zip_with(m, map('chars', CAST(1 AS BIGINT),
                 |    'extra', CAST(5 AS BIGINT)),
                 |  (k, v1, v2) -> coalesce(v1, CAST(0 AS BIGINT))
                 |    + coalesce(v2, CAST(0 AS BIGINT))))""".stripMargin)
            .as("zipped"))
    }),

    // F19: custom UDTF — the Catalyst Generator [[ChunkSpans]] invoked
    // FROM SQL TEXT via LATERAL VIEW, resolved through the session
    // FunctionRegistry (the one extension surface F8's built-in explode
    // left unexercised; SURVEY §2B UDF summary). Overlapping token
    // windows (size 30, stride 24 → 6-token overlap) over each doc; the
    // oracle re-expresses the window arithmetic as DuckDB list slices
    // (the m6 pattern at different dials), so the generator's emission
    // order, chunk boundaries, and tail handling are all hash-pinned.
    // FunctionsSpec additionally pins equality with the
    // sequence+posexplode composition it replaces.
    "f19_udtf_chunks" -> ((s, d) => {
      graft.GraftExtensions.ensureFunctions(s)
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .createOrReplaceTempView("f19_docs")
      s.sql("""SELECT doc_id, chunk_idx, chunk FROM f19_docs
              |LATERAL VIEW chunk_spans(t, 30, 24) AS chunk_idx, chunk""".stripMargin)
    }),

    // F14: VARIANT — Spark 4's semi-structured type (the shredded-JSON
    // path the lakehouse format war converged on): parse once into the
    // binary variant encoding, then typed field extraction without
    // re-parsing the JSON text per access — at 100 TB the parse happens
    // once per row at ingest, and every downstream projection reads the
    // typed value. Exercises parse_json → variant_get (typed path
    // extraction), try_variant_get (type-mismatch → NULL instead of
    // failing the scan: a string cast asked of an int field), and
    // schema_of_variant (the inference surface). The oracle re-derives
    // the same values from the raw JSON text — variant must be a
    // faithful, lossless re-encoding.
    "f14_variant" -> ((s, d) => {
      // fanOut: single-split scan ran the variant parse as one ~0.6 s
      // CPU task (the s16/f7 pattern; identity at scale)
      val v = parse_json(col("props"))
      Tables.fanOut(Tables.events(s, d)
          .select(col("event_id"), col("props")),
        col("event_id")).select(
        col("event_id"),
        variant_get(v, "$.k", "int").as("k_int"),
        variant_get(v, "$.k", "string").as("k_str"),
        try_variant_get(v, "$.missing", "int").as("k_missing"),
        schema_of_variant(v).as("v_schema"))
    }),

    // F8: explode / posexplode (Generator / UDTF surface) — word rows.
    "f8_explode" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    }),

    // F9: hash / encode family (crc32 is JVM-only — covered by the
    // known-vector spec instead of the oracle).
    "f9_hash_fns" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        md5(col("c_name").cast(BinaryType)).as("md5_name"),
        sha2(col("c_name").cast(BinaryType), 256).as("sha256_name"),
        hex(col("c_name").cast(BinaryType)).as("hex_name"),
        base64(col("c_name").cast(BinaryType)).as("b64_name"))
    }),

    // F10: cast matrix. double→int goes through floor() because Spark
    // truncates while DuckDB rounds — the explicit floor pins one meaning.
    "f10_casts" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey").cast(StringType).as("key_str"),
        floor(col("o_totalprice")).cast(IntegerType).as("price_int"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast(DoubleType).as("price_dec"),
        col("o_orderdate").cast(DateType).cast(StringType).as("date_str"),
        col("o_orderkey").cast(DoubleType).as("key_dbl"),
        concat(lit("19"), lit("95")).cast(IntegerType).as("str_int"),
        lit("1995-06-17 12:30:00").cast(TimestampType).cast(StringType).as("ts_roundtrip"))
    }),

    // F12: BITWISE family — scalar shifts/AND/OR/XOR/popcount plus the
    // bit_and/bit_or/bit_xor aggregates (the flag-mask and
    // feature-bitmap operations id-heavy pipelines lean on). Scalars
    // evaluate in the scan projection; the aggregates are one
    // partial+final hash aggregate.
    "f12_bitwise" -> ((s, d) => {
      val k = col("c_custkey")
      Tables.customer(s, d)
        .select((k % 16).as("g"),
          expr("bit_count(c_custkey)").as("bc"),
          shiftleft(k, 3).bitwiseAND(lit(255L)).as("sl_and"),
          shiftright(k, 2).bitwiseOR(lit(4096L)).as("sr_or"),
          k.bitwiseXOR(lit(90L)).as("xored"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("bc")).as("sum_bc"),
          expr("bit_and(sl_and)").as("band"),
          expr("bit_or(sr_or)").as("bor"),
          expr("bit_xor(xored)").as("bxor"))
    }),

    // F11: URL functions — the web-corpus provenance family (host for
    // per-domain caps and dedup scoping, path/query-param extraction for
    // filtering). URLs are synthesized deterministically from customer
    // rows so both engines parse identical strings; the engine side is
    // Spark's codegen'd parse_url, the oracle re-derives the parts with
    // anchored regexps. Per-row in the scan projection — zero shuffle.
    "f11_url_fns" -> ((s, d) => {
      val url = concat(lit("https://"),
        regexp_replace(lower(col("c_mktsegment")), " ", ""),
        lit(".example.com/u/"),
        regexp_replace(lower(col("c_name")), "[^a-z0-9]+", "-"),
        lit("?key="), col("c_custkey"), lit("&page=2"))
      Tables.customer(s, d)
        .select(col("c_custkey"), url.as("url"))
        .select(col("c_custkey"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'key')").as("qkey"))
    }),

    // F13: EDIT DISTANCE — levenshtein over adjacent-id document
    // prefixes (the "how different are consecutive crawl records" QA
    // probe). Bounded to 32-char prefixes because levenshtein is
    // O(len²) per pair — unbounded document distance is a design bug,
    // not a missing feature. The adjacent pairing is an equi self-join
    // on doc_id+1: one key-clustered shuffle at any scale, never a
    // cartesian.
    "f13_edit_distance" -> ((s, d) => {
      val a = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 32).as("p1"))
      val b = Tables.documents(s, d)
        .select((col("doc_id") - 1).as("doc_id"),
          substring(col("text"), 1, 32).as("p2"))
      a.join(b, "doc_id")
        .select(col("doc_id"),
          levenshtein(col("p1"), col("p2")).cast(LongType).as("edit_dist"))
    })
  )

  val oracles: Map[String, String] = Map(
    // f23: the identical Morton spread — five shift-mask rounds per
    // key, decimal spellings of the hex magic masks, then interleave.
    // Both engines use two's-complement BIGINT ops, so the pipeline is
    // bit-for-bit the engine Expression's arithmetic.
    "f23_zorder" ->
      """WITH inp AS (
        |  SELECT o_orderkey, o_custkey,
        |    o_custkey & 2147483647 AS a, o_orderkey & 2147483647 AS b
        |  FROM orders WHERE o_orderkey % 5 = 0
        |), s1 AS (SELECT o_orderkey, o_custkey,
        |    (a | (a << 16)) & 281470681808895 AS a,
        |    (b | (b << 16)) & 281470681808895 AS b FROM inp
        |), s2 AS (SELECT o_orderkey, o_custkey,
        |    (a | (a << 8)) & 71777214294589695 AS a,
        |    (b | (b << 8)) & 71777214294589695 AS b FROM s1
        |), s3 AS (SELECT o_orderkey, o_custkey,
        |    (a | (a << 4)) & 1085102592571150095 AS a,
        |    (b | (b << 4)) & 1085102592571150095 AS b FROM s2
        |), s4 AS (SELECT o_orderkey, o_custkey,
        |    (a | (a << 2)) & 3689348814741910323 AS a,
        |    (b | (b << 2)) & 3689348814741910323 AS b FROM s3
        |), s5 AS (SELECT o_orderkey, o_custkey,
        |    (a | (a << 1)) & 6148914691236517205 AS a,
        |    (b | (b << 1)) & 6148914691236517205 AS b FROM s4
        |)
        |SELECT o_orderkey, o_custkey,
        |  CAST((a << 1) | b AS BIGINT) AS zval FROM s5""".stripMargin,

    // f23b: the 3-lane interleave bit-by-bit — 20 bits per lane, lane
    // 0 (custkey) most significant within each group; SUM over
    // disjoint bit positions IS the OR
    "f23b_zorder_n" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST((SELECT SUM(
        |      ((((o_custkey & 1048575) >> i) & 1) << (i*3 + 2)) |
        |      ((((o_orderkey & 1048575) >> i) & 1) << (i*3 + 1)) |
        |      ((((CAST(year(o_orderdate) AS BIGINT) & 1048575) >> i) & 1)
        |        << (i*3 + 0)))
        |    FROM generate_series(0, 19) t(i)) AS BIGINT) AS zval
        |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin,
    // f20: explicit NULL-site forms — CASE for the zero divisor and the
    // overflow parity, TRY_CAST for the dirty string
    "f20_try_functions" ->
      """SELECT o_orderkey,
        |  ROUND(CASE WHEN o_custkey % 7 = 0 THEN NULL
        |        ELSE CAST(ROUND(o_totalprice * 1e2, 0) AS BIGINT)
        |             / (o_custkey % 7) END, 6) AS safe_div,
        |  TRY_CAST(substring(o_orderpriority, 1, 1)
        |    || CASE WHEN o_custkey % 3 = 0 THEN 'x' ELSE '' END AS INT)
        |    AS prio_num,
        |  CASE WHEN o_custkey % 500 = 0 THEN NULL ELSE o_orderkey END
        |    AS safe_add
        |FROM orders""".stripMargin,

    // f22: string_agg with ORDER BY is DuckDB's spelling of the same
    // ordered concatenation; the top-8 cap recomputed via row_number
    "f22_listagg" ->
      """WITH t AS (
        |  SELECT source, lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents
        |)
        |SELECT source,
        |  string_agg(lang, '|' ORDER BY lang, doc_id) AS langs,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |    AS first_ids
        |FROM t WHERE rn <= 8 GROUP BY source""".stripMargin,

    // f21: the same arithmetic with INTERVAL literals; EXTRACT(DAY ...)
    // truncates toward zero in both engines
    "f21_interval_arith" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL '3 days 12 hours 30 minutes' AS due_ts,
        |  o_orderdate + INTERVAL '1 year 6 months' AS anniversary,
        |  o_orderdate - INTERVAL '6 hours' AS cutoff_ts,
        |  o_orderdate + INTERVAL '45 minutes' * (o_orderkey % 4) AS staggered_ts,
        |  CAST(EXTRACT(DAY FROM (o_orderdate - TIMESTAMP '1995-01-01 00:00:00'))
        |    AS BIGINT) AS age_days
        |FROM orders WHERE o_orderkey % 7 = 0""".stripMargin,

    // f19: the generator's window arithmetic re-expressed as DuckDB
    // list slices — ceil(len/stride) chunks, last tail short
    "f19_udtf_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(ceil(len(tk) / 24.0) AS INT))) AS chunk_idx,
        |    unnest(list_transform(range(0, CAST(ceil(len(tk) / 24.0) AS INT)),
        |      i -> array_to_string(tk[i*24+1 : i*24+30], ' '))) AS chunk
        |  FROM t
        |)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk FROM c""".stripMargin,

    "f1_string_fns" ->
      """SELECT p_partkey,
        |  p_brand || '/' || p_type AS brand_type,
        |  substring(p_name, 1, 5) AS name5,
        |  upper(p_name) AS name_up,
        |  lower(p_type) AS type_lo,
        |  length(p_name) AS name_len,
        |  trim('  pad  ') AS trimmed,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  replace(p_name, ' ', '-') AS dashed
        |FROM part""".stripMargin,

    "f2_datetime_fns" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_2k,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
        |FROM orders""".stripMargin,

    "f3_math_fns" ->
      """SELECT o_orderkey,
        |  round(o_totalprice, 1) AS rounded,
        |  CAST(floor(o_totalprice) AS BIGINT) AS floored,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ceiled,
        |  abs(o_totalprice - 100000) AS abs_delta,
        |  round(sqrt(o_totalprice), 6) AS sq,
        |  round(ln(o_totalprice), 6) AS ln_p,
        |  round(exp(o_totalprice / 100000), 6) AS exp_p,
        |  round(pow(o_totalprice, 0.5), 6) AS pow_half,
        |  o_orderkey % 7 AS mod7,
        |  CAST(sign(o_totalprice - 100000) AS DOUBLE) AS sign_delta
        |FROM orders""".stripMargin,

    "f4_conditional_fns" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg_or,
        |  coalesce(nullif(c_name, c_name), 'anon') AS nvl_name,
        |  greatest(c_acctbal, 0.0) AS bal_pos,
        |  least(c_acctbal, 1000.0) AS bal_cap
        |FROM customer""".stripMargin,

    "f5_array_fns" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_toks,
        |  list_contains(toks, 'spark') AS has_spark,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
        |  array_to_string(toks[1:3], ' ') AS first3,
        |  toks[-1] AS last_tok,
        |  list_sort(toks)[1] AS min_tok,
        |  CAST(len(flatten([toks, toks])) AS INT) AS n_doubled
        |FROM t""".stripMargin,

    "f6_map_fns" ->
      """SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS keys,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  CAST(len(json_keys(props)) AS INT) AS n_entries
        |FROM events""".stripMargin,

    "f7_json_fns" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  to_json({'u': user_id}) AS user_json
        |FROM events""".stripMargin,

    "f8_explode" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id, CAST(unnest(range(len(toks))) AS INT) AS pos,
        |  unnest(toks) AS word
        |FROM t""".stripMargin,

    // f16: DuckDB's regexp_extract_all(text, re) ≡ Spark's group-0 form;
    // the single-match stem uses group 1 in both; no-match results are
    // '' in Spark and NULL in DuckDB (array_to_string of an empty list
    // is NULL too) — COALESCE pins the Spark convention
    "f16_regexp_extract" ->
      """SELECT doc_id,
        |  COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{6,}'), ' '), '')
        |    AS long_toks,
        |  CAST(len(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS INT) AS n_a_toks,
        |  COALESCE(regexp_extract(text, '([a-z]+)le', 1), '')
        |    AS first_le_stem
        |FROM documents""".stripMargin,

    // f17: same cents→decimal derivation, same explicit final casts;
    // DuckDB ROUND on DECIMAL is HALF_UP like Spark (pinned on literal
    // ties before this entry shipped)
    "f17_decimal_math" ->
      """WITH t AS (
        |  SELECT o_custkey,
        |    CAST(CAST(CAST(ROUND(o_totalprice * 1e2, 0) AS BIGINT)
        |      AS DECIMAL(14,2)) * CAST(0.01 AS DECIMAL(3,2))
        |      AS DECIMAL(12,2)) AS p
        |  FROM orders
        |), u AS (
        |  SELECT o_custkey, p,
        |    CAST(ROUND(p * CAST(0.0725 AS DECIMAL(6,4)), 2) AS DECIMAL(12,2)) AS tax
        |  FROM t
        |)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(p) AS DECIMAL(18,2)) AS VARCHAR) AS sum_p,
        |  CAST(CAST(SUM(tax) AS DECIMAL(18,2)) AS VARCHAR) AS sum_tax,
        |  CAST(CAST(MAX(p - tax) AS DECIMAL(18,2)) AS VARCHAR) AS max_net
        |FROM u GROUP BY o_custkey""".stripMargin,

    // f18: DuckDB has no map lambdas — the oracle rebuilds each
    // transformed map's exact to_json text from the same scalars
    // (empty-filter case renders '{}' because concat_ws drops NULLs)
    "f18_map_hof" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars AS c,
        |    len(string_split(text, ' ')) AS w
        |  FROM documents
        |)
        |SELECT doc_id,
        |  '{"chars":' || (c*2) || ',"words":' || (w*2) || '}' AS doubled,
        |  '{"chars_' || (c%10) || '":' || c ||
        |    ',"words_' || (w%10) || '":' || w || '}' AS rekeyed,
        |  '{' || concat_ws(',',
        |    CASE WHEN c%2=0 THEN '"chars":'||c END,
        |    CASE WHEN w%2=0 THEN '"words":'||w END) || '}' AS evens,
        |  '{"chars":' || (c+1) || ',"words":' || w || ',"extra":5}' AS zipped
        |FROM t""".stripMargin,

    // f15: integer-valued doubles make the zip_with dot product exact in
    // any summation order, so DuckDB's list_dot_product matches Spark's
    // sequential fold bit for bit
    "f15_higher_order" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(toks, t -> CAST(length(t) AS BIGINT))),
        |    (a, x) -> a + x) AS sum_len,
        |  CAST(len(list_filter(toks, t -> length(t) > 4)) AS INT) AS n_long,
        |  list_contains(toks, 'spark') AS has_spark,
        |  len(list_filter(toks, t -> length(t) = 0)) = 0 AS all_nonempty,
        |  list_dot_product(
        |    list_transform(toks, t -> CAST(length(t) AS DOUBLE)),
        |    list_reverse(list_transform(toks, t -> CAST(length(t) AS DOUBLE))))
        |    AS len_dot_rev
        |FROM t""".stripMargin,

    // f14: the oracle re-derives the typed values from the raw JSON
    // text (variant must be a lossless re-encoding); the props fixture
    // is uniformly {"k": <int>} so the inferred schema is the constant
    // OBJECT<k: BIGINT> — asserted as the literal it should be
    "f14_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(NULL AS INT) AS k_missing,
        |  'OBJECT<k: BIGINT>' AS v_schema
        |FROM events""".stripMargin,

    "f9_hash_fns" ->
      """SELECT c_custkey,
        |  md5(c_name) AS md5_name,
        |  sha256(c_name) AS sha256_name,
        |  hex(c_name) AS hex_name,
        |  base64(encode(c_name)) AS b64_name
        |FROM customer""".stripMargin,

    "f10_casts" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(floor(o_totalprice) AS INT) AS price_int,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
        |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
        |  CAST('19' || '95' AS INT) AS str_int,
        |  CAST(CAST('1995-06-17 12:30:00' AS TIMESTAMP) AS VARCHAR) AS ts_roundtrip
        |FROM orders""".stripMargin,

    "f12_bitwise" ->
      """WITH t AS (
        |  SELECT c_custkey % 16 AS g,
        |    bit_count(c_custkey) AS bc,
        |    (c_custkey << 3) & 255 AS sl_and,
        |    (c_custkey >> 2) | 4096 AS sr_or,
        |    xor(c_custkey, 90) AS xored
        |  FROM customer
        |)
        |SELECT g, COUNT(*) AS n, CAST(SUM(bc) AS BIGINT) AS sum_bc,
        |  bit_and(sl_and) AS band, bit_or(sr_or) AS bor,
        |  bit_xor(xored) AS bxor
        |FROM t GROUP BY g""".stripMargin,

    "f11_url_fns" ->
      """WITH u AS (
        |  SELECT c_custkey,
        |    'https://' || regexp_replace(lower(c_mktsegment), ' ', '', 'g')
        |      || '.example.com/u/'
        |      || regexp_replace(lower(c_name), '[^a-z0-9]+', '-', 'g')
        |      || '?key=' || c_custkey || '&page=2' AS url
        |  FROM customer
        |)
        |SELECT c_custkey, url,
        |  regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
        |  regexp_extract(url, '[?&]key=([^&#]*)', 1) AS qkey
        |FROM u""".stripMargin,

    "f13_edit_distance" ->
      """SELECT a.doc_id,
        |  CAST(levenshtein(substr(a.text, 1, 32), substr(b.text, 1, 32))
        |       AS BIGINT) AS edit_dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""".stripMargin
  )
}
