"""Local stand-in for the driver's DuckDB correctness gate.

Runs every __spark_entry__.queries()[name] at a given sf_dir and compares
with oracle_sql()[name] via DuckDB: row count, column names, and
order-insensitive value equality (sorted rows, exact for
strings/ints/timestamps, near-exact for floats).

Usage: python tools/check_queries.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def compare(spdf: pd.DataFrame, dkdf: pd.DataFrame, name: str) -> list[str]:
    problems = []
    if len(spdf) != len(dkdf):
        problems.append(f"rowcount spark={len(spdf)} duck={len(dkdf)}")
    sp_cols = sorted(spdf.columns.str.lower())
    dk_cols = sorted(dkdf.columns.str.lower())
    if sp_cols != dk_cols:
        problems.append(f"columns spark={sp_cols} duck={dk_cols}")
        return problems
    a = spdf.copy(); a.columns = a.columns.str.lower(); a = a[sp_cols]
    b = dkdf.copy(); b.columns = b.columns.str.lower(); b = b[sp_cols]
    for df in (a, b):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]")
    key = lambda df: df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    if len(a):
        a = a.iloc[key(a).argsort().values].reset_index(drop=True)
    if len(b):
        b = b.iloc[key(b).argsort().values].reset_index(drop=True)
    if len(a) == len(b):
        for c in sp_cols:
            av, bv = a[c], b[c]
            # The driver's value-hash stringifies each cell, so an
            # int64-vs-float64 split (e.g. Spark BIGINT vs DuckDB
            # HUGEINT->float64) renders 19525 vs 19525.0 and fails there
            # even when values match. Flag it here instead of masking it
            # with float tolerance.
            if {av.dtype.kind, bv.dtype.kind} == {"i", "f"}:
                problems.append(
                    f"col {c}: dtype split spark={av.dtype} duck={bv.dtype} "
                    "(driver hash would fail; CAST the oracle side)"
                )
                continue
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                bad = ~(
                    (av.isna() & bv.isna())
                    | (abs(av.astype(float) - bv.astype(float)) <= 1e-9 + 1e-9 * abs(bv.astype(float)))
                )
            else:
                bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
            if bad.any():
                i = bad.idxmax()
                problems.append(f"col {c}: {int(bad.sum())} diffs, e.g. row {i}: spark={av[i]!r} duck={bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from web_crawler_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = E.queries(), E.oracle_sql()
    if len(qs) > 50:
        # the driver records at most 50 CORRECTNESS rows (registry
        # order) — anything past 50 gets ZERO graded evidence
        print(f"FAIL registry-size: {len(qs)} keys registered, driver "
              "budget is 50 — consolidate (see __spark_entry__.py fold map)")
        return 1
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"rows-only {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            dkdf = con.sql(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            n_fail += 1
            continue
        problems = compare(spdf, dkdf, name)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
