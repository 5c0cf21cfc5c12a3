#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables, compare to the Spark result
parquet dumped by graft.Verify (columns sorted by name, rows sorted,
values compared with exact match for non-floats / tiny-eps for floats).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        results[name] = compare(spark_df, duck_df)
    ok = sum(1 for v in results.values() if v == "OK" or str(v).startswith("ROWS_ONLY"))
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' or str(v).startswith('ROWS_ONLY') else 'FAIL':4} {name}: {v}")
    print(f"\n{ok}/{len(results)} pass")
    return 0 if ok == len(results) else 1

def _destructure(df):
    # array/list columns aren't hashable/sortable in pandas — stringify
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: json.dumps(np.asarray(v).tolist()) if v is not None else None)
    return df

def compare(a, b):
    a = _destructure(a.reindex(sorted(a.columns), axis=1))
    b = _destructure(b.reindex(sorted(b.columns), axis=1))
    if list(a.columns) != list(b.columns):
        return f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT spark={len(a)} duck={len(b)}"
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                avn = av.astype(float).to_numpy()
                bvn = bv.astype(float).to_numpy()
                both_nan = np.isnan(avn) & np.isnan(bvn)
                # The driver's gate hashes exact stringified values, so a
                # 1-ulp float difference FAILS there. Mirror that: exact
                # bit equality required; isclose only softens the message.
                exact = (avn == bvn) | both_nan
                if not np.all(exact):
                    close = np.isclose(avn, bvn, rtol=1e-9, atol=1e-12, equal_nan=True)
                    i = int(np.argmin(exact))
                    kind = "CLOSE_NOT_EXACT(hash risk)" if np.all(close | both_nan) else "VALUE_MISMATCH"
                    return f"{kind} col={c} row={i} spark={avn[i]!r} duck={bvn[i]!r}"
                # int-vs-float dtype mismatch (e.g. DuckDB HUGEINT→float64 vs
                # Spark int64) stringifies the same number differently
                # ("123.0" vs "123") → driver hash fail. All-null columns are
                # fine: the driver normalizes None/NaN together (r02 evidence).
                if {av.dtype.kind, bv.dtype.kind} & {'i', 'u'} and \
                        av.dtype.kind != bv.dtype.kind and not np.all(both_nan):
                    return (f"DTYPE_MISMATCH(hash risk) col={c} "
                            f"spark={av.dtype} duck={bv.dtype}")
            else:
                # normalize nulls (None/NaT/NaN stringify differently)
                av = av.map(lambda v: "<NULL>" if v is None or (isinstance(v, float) and np.isnan(v)) or str(v) in ("NaT", "nan") else str(v))
                bv = bv.map(lambda v: "<NULL>" if v is None or (isinstance(v, float) and np.isnan(v)) or str(v) in ("NaT", "nan") else str(v))
                if not av.astype(str).equals(bv.astype(str)):
                    neq = (av.astype(str) != bv.astype(str))
                    i = int(neq.idxmax())
                    return f"VALUE_MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
        except Exception as e:
            return f"COMPARE_ERROR col={c}: {e}"
    return "OK"

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
