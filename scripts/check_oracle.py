#!/usr/bin/env python
"""Mini-driver: replicate the round driver's correctness gate locally.

Runs every ``__spark_entry__.queries()`` entry in Spark and its
``oracle_sql()`` in DuckDB over the same parquet tables, then compares
row count, sorted column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [--sf /root/testdata/sf0.01] [--only name]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df: pd.DataFrame, lenient: bool = False) -> pd.DataFrame:
    """Order-insensitive canonical form: sort columns by name, normalize
    dtypes, sort rows by all columns.

    Strict by default: DuckDB HUGEINT/Decimal (object dtype) is NOT coerced
    to numeric, mirroring the round driver's hasher — an oracle whose sum()
    returns HUGEINT must CAST to BIGINT or it fails here too (the r2
    tpch_q12ish/q15ish lesson)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if lenient and s.dtype == object:
            # DuckDB returns HUGEINT (int128) / Decimal as object dtype.
            coerced = pd.to_numeric(s, errors="coerce")
            if coerced.notna().eq(s.notna()).all():
                s = df[c] = coerced
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean").astype("object")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        else:
            df[c] = s.astype("string")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names, or a prefix ending in '*'",
    )
    ap.add_argument(
        "--lenient",
        action="store_true",
        help="coerce DuckDB HUGEINT/Decimal and align int-vs-float dtype "
        "splits (hides typing mismatches the round driver would fail)",
    )
    ap.add_argument(
        "--json",
        default=None,
        help="write per-query results to this JSON file (committed per round "
        "as ORACLE_FULL_r{N}.json so the full registry stays auditable)",
    )
    args = ap.parse_args()

    def selected(name: str) -> bool:
        if not args.only:
            return True
        for pat in args.only.split(","):
            if pat.endswith("*") and name.startswith(pat[:-1]):
                return True
            if name == pat:
                return True
        return False

    import __spark_entry__ as E
    from hive_udf_spark.session import get_spark

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    n_run = 0
    for name, fn in qs.items():
        if not selected(name):
            continue
        n_run += 1
        t0 = time.time()
        rec = results[name] = {
            "match": False,
            "mode": "oracle" if name in oracles else "rows_only",
            "spark_rows": None,
            "seconds": None,
            "err": None,
        }
        try:
            got = fn(spark, args.sf).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            rec["err"] = f"spark: {ex}"
            failures.append(name)
            continue
        rec["spark_rows"] = len(got)
        rec["seconds"] = round(time.time() - t0, 2)
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            if len(got) == 0:
                rec["err"] = "0 rows"
                failures.append(name)
            else:
                rec["match"] = True
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            rec["err"] = f"duckdb: {ex}"
            failures.append(name)
            continue
        g, w = _canon(got, args.lenient), _canon(want, args.lenient)
        if args.lenient:
            # Align residual numeric dtype splits (e.g. Int64 vs float64).
            for c in set(g.columns) & set(w.columns):
                if g[c].dtype != w[c].dtype and all(
                    pd.api.types.is_numeric_dtype(x[c]) for x in (g, w)
                ):
                    g[c] = np.round(g[c].astype("float64"), 6)
                    w[c] = np.round(w[c].astype("float64"), 6)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            rec["err"] = f"columns {list(g.columns)} != {list(w.columns)}"
            failures.append(name)
        elif len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            rec["err"] = f"rows {len(g)} != {len(w)}"
            failures.append(name)
        elif not g.equals(w):
            # (g != w) yields NA when either side is NA; one-sided NA is a
            # real mismatch (fillna True), both-NA is equality (masked out)
            diff = (g != w).fillna(True) & ~(g.isna() & w.isna())
            ncell = int(diff.to_numpy().sum())
            print(f"FAIL  {name}: {ncell} mismatched cells")
            idx = diff.any(axis=1)
            print("  spark:", g[idx].head(3).to_dict("records"))
            print("  duckdb:", w[idx].head(3).to_dict("records"))
            rec["err"] = f"{ncell} mismatched cells"
            failures.append(name)
        else:
            print(f"OK    {name}: {len(g)} rows [{time.time()-t0:.1f}s]")
            rec["match"] = True

    print(f"\n{n_run - len(failures)}/{n_run} queries match")
    if args.json:
        import json

        payload = {
            "sf": args.sf,
            "lenient": args.lenient,
            "n_run": n_run,
            "n_match": n_run - len(failures),
            "failures": failures,
            "queries": results,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=False)
            f.write("\n")
        print(f"wrote {args.json}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
