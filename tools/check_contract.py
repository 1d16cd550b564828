"""Local replica of the driver's correctness gate: run each
__spark_entry__ query on Spark and its oracle on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_contract.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from ts_pymfe_spark.session import get_spark
from ts_pymfe_spark.sources.testdata import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        return v
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def frame_key(df, cols):
    rows = [tuple(norm_cell(row[c]) for c in cols) for _, row in df.iterrows()]
    return sorted(rows, key=repr)


def main():
    only = set(sys.argv[1:])
    spark = get_spark("contract_check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in os_:
            print(f"ROWS  {name}: {len(got)} rows (rows-only check)")
            if len(got) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            exp = con.execute(os_[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            failures.append((name, f"schema {gc} vs {ec}"))
            print(f"FAIL  {name}: schema {gc} vs {ec}")
            continue
        if len(got) != len(exp):
            failures.append((name, f"rows {len(got)} vs {len(exp)}"))
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}")
            continue
        gk, ek = frame_key(got, gc), frame_key(exp, gc)
        n_bad = sum(1 for a, b in zip(gk, ek) if a != b)
        if n_bad:
            print(f"FAIL  {name}: {n_bad}/{len(gk)} mismatched rows")
            for a, b in list(zip(gk, ek))[:200]:
                if a != b:
                    print("   spark:", a)
                    print("   duck :", b)
                    break
            failures.append((name, f"{n_bad} mismatches"))
        else:
            print(f"OK    {name}: {len(gk)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print(f"ALL OK ({len([n for n in qs if not only or n in only])} queries)")


if __name__ == "__main__":
    main()
