#!/usr/bin/env python3
"""Build the per-query `engine | oracle | ratio | rows` markdown table
promised in BASELINE.md §4, from:
  - a bench_full.json produced by graft.Bench (full names, medians)
  - DuckDB timings over the same oracle SQL at the same scale factor
  - row counts from a graft.Verify output dir (parquet per query)

Usage:
  python3 tools/ratio_table.py <sfDir> <bench_full.json> <verifyOutDir>

Driver-side tooling only (duckdb/pyarrow are the oracle stack, not
engine dependencies).
"""
import json, sys, os, time, glob
import duckdb
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# Like-for-like aggregates (BASELINE §5.x). Two subsets are reported:
#
#  * FLOATING (the historical gate rule): oracle-covered queries where
#    DuckDB spends >= 50 ms, excluding file-writing round-trips, the
#    dump-and-recompute policy twins, and the deliberately quadratic-
#    oracle similarity entries. Membership MOVES as entries are added
#    and DuckDB timings drift around the 50 ms cut — r9->r10 the gate
#    number moved 1.44x->1.83x almost entirely by composition.
#
#  * PINNED (r10 next #3): the exact 56-query membership of the r10
#    record's like-for-like subset (BASELINE §5.9), frozen byte-for-
#    byte. Comparing the pinned number across rounds isolates CODE
#    drift from subset composition; new entries never join it.
# ---------------------------------------------------------------------------
POLICY_TWINS = {"l2g_minhash_policy", "l2h_simhash_policy",
                "m5b_cluster_policy", "l12b_semdedup_policy",
                # r13: PQ codebook dump-and-recompute (same stance)
                "l3g_pq_codes",
                # r17: linear-oracle twins of the quadratic-oracle
                # entries (dump-and-recompute; excluded from the
                # floating subset like every other twin)
                "l24b_overlap_matrix_dump", "l4c_embedding_dedup_policy"}
QUADRATIC_ORACLE = {"l2e_jaccard_dedup", "l2c_shingle_jaccard",
                    "l2d_containment",
                    # r12: same quadratic-pair-join oracle stance as l2e
                    "l24_cross_source_overlap"}
FILE_WRITERS = {"s4_csv_roundtrip", "s5_ndjson_roundtrip",
                "s6_partitioned_parquet", "s6b_partition_pruned_read",
                "s7_pgn_sink", "s7b_pgn_roundtrip", "s9_orc_roundtrip",
                "s10_schema_merge", "s11_bucketed_join",
                "s12_corrupt_ndjson", "s13_dynamic_pruning",
                "m7_compact", "m14_zorder_layout",
                # late-r11 physical-write round-trips (l8e/s14/sql11
                # never met the 50 ms DuckDB cut; listed for rule purity)
                "m23_incremental_rollup", "m25_partition_overwrite",
                "m27_quarantine_route", "sql11_ctas",
                "l8e_multimodal_binaryfile", "s14_stats_skipping",
                # r12 physical-write round-trips: s15 writes two parquet
                # generations, sql13 CTASes the target then MERGEs (CoW
                # rewrite) before the read-back
                "s15_schema_evolution", "sql13_merge_into",
                # r13: sql14/sql15 CTAS the target then CoW-rewrite it;
                # t22 writes its NDJSON feed and runs a multi-trigger
                # streaming job before the final table exists
                "sql14_update", "sql15_delete", "t22_stream_batch_parity",
                "t23_stream_interval_join", "m31_release_manifest",
                # r14: sql16/sql17 CTAS + CoW-rewrite, t24/t25 write
                # feeds and run multi-trigger streaming executions
                "sql16_merge_evolution", "sql17_update_nested",
                "t24_stream_session_merge", "t25_stream_cdc_apply",
                "t26_stream_dedup", "m32_time_travel",
                # r14 second wave: snapshot/manifest write round-trips
                # and streaming feed+execution entries
                "m33_table_changes", "m34_incremental_agg",
                "m35_write_audit_publish", "m37_snapshot_expire",
                "t27_stream_static_enrich", "t28_stream_sliding_window",
                "t29_stream_file_sink", "t30_available_now_resume"}
PINNED_SUBSET_R10 = [
    "a13_minmax_by", "a14_mode", "a1_ungrouped_agg", "a2_group_agg",
    "a7_collect_list", "f10_casts", "f11_url_fns", "f1_string_fns",
    "f2_datetime_fns", "f3_math_fns", "f5_array_fns", "f6_map_fns",
    "f7_json_fns", "f8_explode", "j11_overlap_join", "j1_inner_join",
    "j6_multiway", "j7_range_join", "j7b_range_join_bucketed",
    "j9_asof_join", "j9b_asof_native", "j9c_asof_multikey",
    "l10_fingerprint", "l11_decontaminate", "l13_quality_score",
    "l14_dup_passage", "l15_bigram_logprob", "l3_cosine_topk",
    "l4_cosine_threshold", "l4b_embedding_dedup", "l5_text_stats",
    "l5c_unigram_logprob", "l6_tfidf_topterms", "l7_quality_filter",
    "l7b_token_count", "l7d_repetition_filter", "l8b_multimodal_decode",
    "l8c_multimodal_resize", "l9_lang_id", "m17_peak_concurrency",
    "m18_scd2_history", "m1_sessionize", "m2_upsert_merge",
    "m6_chunk_documents", "o1_global_sort", "p1_project_rename",
    "p8_computed", "p9_case_when", "sql1_tpch_q3", "w1_ranking",
    "w2_lag_lead", "w3_running_sum", "w4_range_frame",
    "w5_topk_per_group", "w6_analytic_extras", "w7_session_window"]


def main():
    sf_dir, bench_path, verify_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    bench = json.load(open(bench_path))
    spark_times = bench["queries"]

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(verify_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    def duck_time(sql):
        # §7 denominator protocol (r10 next #8): 5 repetitions, drop the
        # min and max, mean of the middle 3. Sub-second embedded timings
        # are noise-dominated — the 3-rep median swung the r10 denominator
        # 9.4–11.9 s across same-code runs, moving the gate ratio ±0.2×.
        # A first rep ≥ 5 s stands alone (l2e's 190 s quadratic oracle:
        # proportional noise is negligible and 4 more reps would add
        # ~13 min for nothing).
        t0 = time.time()
        con.execute(sql).fetchall()
        first = time.time() - t0
        if first >= 5.0:
            return first
        times = [first]
        for _ in range(4):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        mid = sorted(times)[1:-1]
        return sum(mid) / len(mid)

    def rows_out(name):
        d = os.path.join(verify_dir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            return None
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    print("| query | engine s | duckdb s | ratio | rows out |")
    print("|---|---|---|---|---|")
    covered = {}  # name -> (engine s, duckdb s)
    uncovered = []
    for name in sorted(spark_times):
        s = spark_times[name]
        r = rows_out(name)
        rtxt = str(r) if r is not None else "—"
        if name in oracles:
            try:
                d = duck_time(oracles[name])
            except Exception:
                d = float("nan")
            if s > 0 and d == d:
                covered[name] = (s, d)
            ratio = f"{s/d:.1f}×" if d and d == d else "err"
            print(f"| {name} | {s:.3f} | {d:.3f} | {ratio} | {rtxt} |")
        else:
            uncovered.append(name)
            print(f"| {name} | {s:.3f} | — | rows-only | {rtxt} |")

    def agg(label, names):
        ss = sum(covered[n][0] for n in names)
        dd = sum(covered[n][1] for n in names)
        # guard: with zero members (or all-error DuckDB runs) dd stays
        # 0.0 — print the row without a ratio instead of dying
        ratio = f"{ss/dd:.2f}×" if dd > 0 else "—"
        print(f"| **{label} ({len(names)})** | **{ss:.1f}** | **{dd:.1f}** "
              f"| **{ratio}** | |")

    agg("oracle-covered total", sorted(covered))
    floating = [n for n, (s, d) in covered.items()
                if d >= 0.050 and n not in FILE_WRITERS
                and n not in POLICY_TWINS and n not in QUADRATIC_ORACLE]
    agg("floating data-bound subset", sorted(floating))
    pinned = [n for n in PINNED_SUBSET_R10 if n in covered]
    agg("pinned r10 subset", pinned)
    missing = [n for n in PINNED_SUBSET_R10 if n not in covered]
    if missing:
        print(f"pinned-subset members missing from this run: {missing}",
              file=sys.stderr)
    print(f"\n{len(uncovered)} rows-only entries (no SQL oracle): "
          + " ".join(uncovered), file=sys.stderr)


if __name__ == "__main__":
    main()
