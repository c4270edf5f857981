#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: row count, column names (sorted), and a hash of the value matrix
with columns sorted by name and rows sorted.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            try:
                col = col.dt.tz_localize(None)
            except TypeError:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            # keep sub-second precision: truncating here would hide real
            # divergences the driver's own compare could still catch
            df[c] = col.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.round(9)
        elif col.dtype == object:
            df[c] = col.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    dirs = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    # every declared query must have output: a query that threw before
    # writing (no dir at all) must FAIL the gate, not silently vanish
    declared = set()
    qn = f"{out_dir}/query_names.json"
    if os.path.exists(qn):
        declared = set(json.load(open(qn)))
    names = sorted(set(dirs) | set(oracle.keys()) | declared)
    if not names:
        print(f"no query outputs or oracle entries under {out_dir}")
        return 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO-OUTPUT (query wrote nothing — failed in Verify?)"
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            results[name] = f"rows-only: {len(got)} rows " + ("OK" if len(got) > 0 else "EMPTY!")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        gc, ec = canon(got), canon(exp)
        if sorted(gc.columns) != sorted(ec.columns):
            results[name] = f"COLS-MISMATCH spark={sorted(gc.columns)} duck={sorted(ec.columns)}"
        elif len(gc) != len(ec):
            results[name] = f"ROWS-MISMATCH spark={len(gc)} duck={len(ec)}"
        elif h(gc) != h(ec):
            diff = (gc != ec) & ~(gc.isna() & ec.isna())
            bad = diff.any(axis=1)
            sample = ""
            if bad.any():
                i = bad.idxmax()
                sample = f" first-diff row {i}: spark={gc.loc[i].to_dict()} duck={ec.loc[i].to_dict()}"
            results[name] = "HASH-MISMATCH" + sample
        else:
            results[name] = f"OK ({len(gc)} rows)"
    width = max(len(n) for n in results) if results else 10
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.endswith("OK"))
    for name_, v in sorted(results.items()):
        print(f"{name_:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} passing")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
