#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet,
canonicalizes both sides (sort by all columns, round doubles to 6dp,
timestamps to UTC ISO strings) and diffs. Driver-side tooling only —
the engine itself never depends on this.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

class UnserializedNested(Exception):
    """An output column still contains arrays/structs/maps.

    The driver's canonicalizer CRASHES on these (pandas sort_values:
    'unhashable type: numpy.ndarray' — the f16 r11 escape), so the local
    mirror must fail the query loudly instead of stringifying it away.
    Entries must serialize nested output (array_join / to_json) per the
    repo convention (SURVEY §5.2).
    """

def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-faithful canonicalization: sort columns by name, sort rows
    on the RAW columns, then FORMAT every value to a string and compare
    the string frames exactly. String formatting is what the driver
    hashes, so it (a) absorbs integer WIDTH differences (int32 vs int64
    both format as '5') but (b) keeps integer-vs-float distinct
    ('2555821' != '2555821.0' — the m26 r11 escape that the old
    check_dtype=False compare silently absorbed).
    """
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.apply(
                lambda v: isinstance(v, (list, np.ndarray, dict))).any():
            raise UnserializedNested(c)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    def fmt(s: pd.Series) -> pd.Series:
        if pd.api.types.is_float_dtype(s):
            # v + 0.0 normalizes -0.0 -> 0.0: one engine producing a
            # negative-zero double (e.g. a rounded difference) would
            # otherwise format '-0.000000' vs '0.000000' (ADVICE r12)
            return s.round(6).map(
                lambda v: "NULL" if pd.isna(v) else f"{v + 0.0:.6f}")
        if pd.api.types.is_datetime64_any_dtype(s):
            out = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
            return out.where(s.notna(), "NULL")
        if pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            return s.map(lambda v: "NULL" if pd.isna(v) else str(v))
        # bool(): pd.isna can return numpy.bool_ for numpy scalars, and
        # `is True` misses it, stringifying NULLs as 'nan' (ADVICE r12).
        # Non-scalar cells (array/list values) make pd.isna return an
        # ndarray whose bool() raises — guard with is_scalar so such a
        # cell degrades to str(v) instead of crashing the checker
        # (ADVICE r13)
        return s.map(lambda v: "NULL"
                     if pd.api.types.is_scalar(v) and bool(pd.isna(v))
                     else str(v))
    return pd.DataFrame({c: fmt(df[c]) for c in df.columns})

def band_compare(got: pd.DataFrame, exp: pd.DataFrame, rel: float):
    """Error-band check for estimation-mode sketch entries (the sf1
    machine rule, VERDICT r16 item 4): same schema and rowcount, every
    numeric cell within `rel` relative error of the exact oracle value
    (non-numeric cells still exact). Returns None on pass, else reason.
    """
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        return f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
    if len(g) != len(e):
        return f"ROWCOUNT spark={len(g)} duck={len(e)}"
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    e = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    for c in g.columns:
        if pd.api.types.is_numeric_dtype(e[c]):
            gv = g[c].astype(float).to_numpy()
            ev = e[c].astype(float).to_numpy()
            denom = np.maximum(np.abs(ev), 1.0)
            err = np.abs(gv - ev) / denom
            if np.nanmax(err) > rel:
                i = int(np.nanargmax(err))
                return (f"BAND_EXCEEDED col={c} row={i} got={gv[i]} "
                        f"exact={ev[i]} rel={err[i]:.4f} > {rel}")
        else:
            if not g[c].astype(str).equals(e[c].astype(str)):
                return f"VALUE_MISMATCH (non-numeric col {c} must be exact)"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional per-entry check modes (tools/sf1_rotation.py --commit
    # writes these): "exact" (default), "band:REL", or
    # "oracle-quadratic:excluded"
    modes = {}
    if "--modes" in sys.argv:
        with open(sys.argv[sys.argv.index("--modes") + 1]) as f:
            modes = json.load(f)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        mode = modes.get(name, "exact")
        if mode.startswith("oracle-quadratic") or mode.startswith("fixture-pairset"):
            results[name] = f"ROWS_ONLY({len(got)})" if len(got) > 0 \
                else "EMPTY!"
            continue
        if mode.startswith("band:") and name in oracles:
            try:
                exp = con.execute(oracles[name]).df()
            except Exception as e:
                results[name] = f"ORACLE_SQL_ERROR: {e}"
                continue
            reason = band_compare(got, exp, float(mode.split(":")[1]))
            results[name] = "OK" if reason is None else reason
            continue
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(got)})" if len(got) > 0 else "EMPTY!"
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        try:
            g, e = canon(got), canon(exp)
        except UnserializedNested as ex:
            results[name] = f"UNSERIALIZED_NESTED_COLUMN: {ex} (driver canonicalizer would crash — array_join/to_json it)"
            continue
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) == 0 and len(e) == 0:
            # two empty frames hash-match trivially — a vacuous pin
            # (r12 found j5/p4 shipped this way since round 1)
            results[name] = "EMPTY_RESULT (vacuous pin: both sides 0 rows)"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT spark={len(g)} duck={len(e)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_exact=True)
                results[name] = "OK"
            except AssertionError as ex:
                results[name] = "VALUE_MISMATCH: " + str(ex).split("\n")[0][:200]
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' or v.startswith('ROWS_ONLY') else 'FAIL':4} {k}: {v}")
    print(f"-- {n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
