"""Stricter-than-driver correctness gate.

The driver hashes raw cell values with NO normalization, so anything the
relaxed ``check_contract.py`` forgives (NaN-vs-NULL, -0.0 vs 0.0, int64 vs
int128/float) is a real hash-fail in CORRECTNESS_r{N}.json.  This checker
compares with zero forgiveness:

* dtype kind must agree per column (integer vs float vs object),
* floats compare via ``repr`` (so ``-0.0`` != ``0.0``; ``nan`` must match
  ``nan`` exactly, never NULL),
* NULL (None/NaT) only equals NULL.

Usage: python tools/strict_contract.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from ts_pymfe_spark.session import get_spark
from ts_pymfe_spark.sources.testdata import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def cell_key(v):
    """Zero-forgiveness canonical form: the driver sees exactly this."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        # repr keeps the -0.0 sign and full precision
        return f"float:{v!r}"
    if isinstance(v, int):
        return f"int:{v}"
    if pd.isna(v):  # pandas NaT / NA
        return "NULL"
    return f"{type(v).__name__}:{v}"


def frame_key(df, cols):
    out = []
    for _, row in df.iterrows():
        out.append(tuple(cell_key(row[c]) for c in cols))
    return sorted(out)


def dtype_kind(s: pd.Series) -> str:
    k = s.dtype.kind
    return {"i": "int", "u": "int", "f": "float", "O": "obj", "b": "bool",
            "M": "ts", "m": "td"}.get(k, k)


def main():
    only = set(sys.argv[1:])
    spark = get_spark("strict_contract", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in os_:
            print(f"ROWS  {name}: {len(got)} rows (rows-only)")
            if len(got) == 0:
                failures.append(name)
            continue
        try:
            exp = con.execute(os_[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            failures.append(name)
            print(f"FAIL  {name}: schema {gc} vs {ec}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}")
            continue
        # dtype-kind agreement per column (int64 vs float64 vs object)
        kind_bad = [
            (c, dtype_kind(got[c]), dtype_kind(exp[c]))
            for c in gc
            if dtype_kind(got[c]) != dtype_kind(exp[c])
        ]
        if kind_bad:
            failures.append(name)
            print(f"FAIL  {name}: dtype kinds {kind_bad}")
            continue
        gk, ek = frame_key(got, gc), frame_key(exp, gc)
        if gk != ek:
            failures.append(name)
            bad = [(a, b) for a, b in zip(gk, ek) if a != b][:3]
            print(f"FAIL  {name}: value diff, first: {bad}")
            continue
        print(f"OK    {name}: {len(got)} rows strict-match")
    print()
    if failures:
        print(f"STRICT FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("ALL STRICT-GREEN")


if __name__ == "__main__":
    main()
