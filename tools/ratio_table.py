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
        # median of 3, matching the engine protocol
        times = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        return sorted(times)[1]

    def rows_out(name):
        d = os.path.join(verify_dir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            return None
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    print("| query | engine s | duckdb s | ratio | rows out |")
    print("|---|---|---|---|---|")
    tot_s = tot_d = 0.0
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
                tot_s += s
                tot_d += d
            ratio = f"{s/d:.1f}×" if d and d == d else "err"
            print(f"| {name} | {s:.3f} | {d:.3f} | {ratio} | {rtxt} |")
        else:
            uncovered.append(name)
            print(f"| {name} | {s:.3f} | — | rows-only | {rtxt} |")
    # guard: with zero oracle-covered queries (or all-error DuckDB runs)
    # tot_d stays 0.0 — print the table without a ratio instead of dying
    tot_ratio = f"{tot_s/tot_d:.1f}×" if tot_d > 0 else "—"
    print(f"| **oracle-covered total** | **{tot_s:.1f}** | **{tot_d:.1f}** "
          f"| **{tot_ratio}** | |")
    print(f"\n{len(uncovered)} rows-only entries (no SQL oracle): "
          + " ".join(uncovered), file=sys.stderr)


if __name__ == "__main__":
    main()
