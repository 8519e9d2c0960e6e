#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs each ``queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (exact after per-column
normalization). Usage::

    python tools/check_oracle.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        # The driver's gate hashes STRINGIFIED values, so int64 2 vs
        # float64 2.0 is a hard mismatch there even though a == b holds
        # numerically. Mirror that strictness: dtype *class* must agree.
        # (Root cause of the r5 `cur_pack_sequences` red row: DuckDB
        # window SUM(INT) -> HUGEINT -> float64 in fetchdf.)
        kind = lambda x: (
            "f" if np.issubdtype(x.dtype, np.floating)
            else "i" if np.issubdtype(x.dtype, np.integer)
            else "o"
        )
        if kind(a) != kind(b):
            problems.append(
                f"column {c}: dtype class mismatch spark={a.dtype} duck={b.dtype}"
                " (driver value-hash would be red — CAST in the oracle SQL)"
            )
            continue
        if np.issubdtype(a.dtype, np.floating):
            ok = np.allclose(a, b, rtol=0, atol=0, equal_nan=True)
            if not ok:
                near = np.allclose(a, b, rtol=1e-9, atol=1e-9, equal_nan=True)
                diff = np.nanmax(np.abs(a - b)) if len(a) else 0
                problems.append(
                    f"column {c}: float mismatch (max abs diff {diff:.3e}"
                    + (", within 1e-9 — would likely pass a rounded hash)" if near else ", LARGE)")
                )
        else:
            if not (a == b).all():
                n_bad = int((a != b).sum())
                problems.append(f"column {c}: {n_bad} value mismatches")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--prefix", type=int, default=None,
        help="check only the first N registry entries (the driver gates "
        "REGISTRY[0:50] — `--prefix 50` replicates exactly that set)",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from hadoopgis_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.prefix is not None:
        names = list(qs)[: args.prefix]
        if args.queries:
            # intersect rather than silently ignoring explicit names —
            # and fail loudly if a requested query isn't in the prefix
            outside = [q for q in args.queries if q not in names]
            if outside:
                print(f"error: not in the first {args.prefix}: {outside}")
                return 1
            names = [q for q in names if q in set(args.queries)]
    else:
        names = args.queries or sorted(qs)

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    n_pass = n_fail = n_weak = 0
    for name in names:
        if name not in qs:
            print(f"[SKIP] {name}: not in queries()")
            continue
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"[WEAK] {name}: rows={len(spark_pdf)} (no oracle, rows-only) {t_spark:.1f}s")
            n_weak += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"[FAIL] {name}: rows={len(spark_pdf)} " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"[PASS] {name}: rows={len(spark_pdf)} ({t_spark:.1f}s spark)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
