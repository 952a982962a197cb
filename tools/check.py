#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [--strict-dtypes] <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares: column names (sorted), dtypes
(loosely), row count, and values (sorted rows).

--strict-dtypes additionally fails a query when a column's pandas dtype
KIND differs between the Spark parquet and the DuckDB fetchdf (int vs
float vs object vs bool vs datetime; integer widths are equivalent).
This catches DuckDB's silent BIGINT->HUGEINT widening on sum()/`//`
(materialized as float64, which the driver hashes as `1234.0` vs
Spark's int64 `1234` -- the p81/q81 round-7 red rows): value compare
passes, hash compare does not. Keep the suite green under this flag.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

STRICT_DTYPES = False

# dtype kinds that hash identically for equal values: all int widths
# (signed + unsigned) are one family; everything else must match kind.
def _kind(dt):
    k = dt.kind
    return 'i' if k in ('i', 'u') else k

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def compare(name, spark_df, oracle_df):
    problems = []
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        return [f"columns differ: spark={sc} oracle={oc}"]
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    s, o = norm(spark_df), norm(oracle_df)
    n = min(len(s), len(o))
    for c in s.columns:
        a, b = s[c].iloc[:n], o[c].iloc[:n]
        if STRICT_DTYPES and _kind(a.dtype) != _kind(b.dtype):
            problems.append(f"col {c}: dtype kind mismatch spark={a.dtype} oracle={b.dtype} (driver hashes these differently even when values agree)")
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af = a.astype(float); bf = b.astype(float)
                bad = ~((af.isna() & bf.isna()) | (af == bf))
            else:
                aa = a.astype(object).where(pd.notna(a), None)
                bb = b.astype(object).where(pd.notna(b), None)
                bad = pd.Series([x != y for x, y in zip(aa, bb)])
            if bad.any():
                i = int(np.argmax(bad.values))
                problems.append(f"col {c}: {int(bad.sum())} mismatches; first at row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} (dtypes {a.dtype}/{b.dtype})")
        except Exception as e:
            problems.append(f"col {c}: compare error {e} (dtypes {a.dtype}/{b.dtype})")
    return problems

def main():
    global STRICT_DTYPES
    argv = [a for a in sys.argv[1:] if a != "--strict-dtypes"]
    STRICT_DTYPES = len(argv) != len(sys.argv) - 1
    out_dir, sf_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    names = sorted(oracle.keys())
    n_pass = n_fail = 0
    for name in names:
        if only and name not in only:
            continue
        pq = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {pq}")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"   - {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
