#!/usr/bin/env python3
"""Time the DuckDB oracle side at a given scale factor (driver-side
comparator per BASELINE.md §4). Usage:
  python3 tools/bench_oracle.py <sfDir> <oracle_sql.json> [spark_bench.json]
Prints per-query duckdb seconds; with a spark bench JSON, prints the ratio
table (query | spark s | duck s | ratio).
"""
import json, sys, time, os
import duckdb

def main():
    sf_dir, sql_path = sys.argv[1], sys.argv[2]
    spark_times = {}
    if len(sys.argv) > 3:
        with open(sys.argv[3]) as f:
            spark_times = json.load(f).get("queries", {})
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(sql_path) as f:
        oracles = json.load(f)
    rows = []
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            dt = time.time() - t0
        except Exception as e:
            dt = float("nan")
        rows.append((name, spark_times.get(name), dt))
    print(f"{'query':28} {'spark_s':>8} {'duck_s':>8} {'ratio':>7}")
    tot_s = tot_d = 0.0
    for name, s, d in rows:
        r = (s / d) if (s and d and d > 0) else float("nan")
        if s and s > 0 and d == d:
            tot_s += s; tot_d += d
        print(f"{name:28} {s if s is not None else float('nan'):8.3f} {d:8.3f} {r:7.2f}")
    print(f"{'TOTAL(oracle-covered)':28} {tot_s:8.3f} {tot_d:8.3f} {tot_s/tot_d if tot_d else 0:7.2f}")

if __name__ == "__main__":
    main()
