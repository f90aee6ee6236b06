"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, sorted column names, and
values (exact for non-floats; floats exact-first with max-abs-diff
reporting). Usage:

    python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
    if sorted(sdf.columns) != sorted(ddf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        return problems
    # dtype-strict: the driver's hasher may not normalize int/timestamp
    # widths, so any pre-normalization dtype divergence is a failure here
    for c in sorted(sdf.columns):
        a, b = str(sdf[c].dtype), str(ddf[c].dtype)
        if a != b and not (a.startswith("datetime64") and b.startswith("datetime64")):
            problems.append(f"dtype col {c}: spark={a} duck={b}")
    s, d = normalize(sdf), normalize(ddf)
    if len(s) != len(d):
        return problems
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c]) and pd.api.types.is_float_dtype(d[c]):
            a, b = s[c].to_numpy(), d[c].to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            neq = ~both_nan & (a != b)
            if neq.any():
                mx = np.nanmax(np.abs(a[neq] - b[neq]))
                problems.append(f"float col {c}: {neq.sum()} diffs, max_abs_diff={mx:.3e}")
        else:
            neq = ~((s[c] == d[c]) | (s[c].isna() & d[c].isna()))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={s[c].iloc[i]!r} duck={d[c].iloc[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("selfcheck", cpus=8, shuffle_partitions=8)
    # fail in seconds with a schema diff if the driver regenerated the
    # testdata with drifted types (the r3 ts incident), instead of a
    # cryptic mid-run failure
    from tf_prisma_api_data_ingestion_spark import tables
    tables.assert_contract(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from tf_prisma_api_data_ingestion_spark import cache

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            cache.release_all()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle SQL raised: {ex}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
            n_fail += 1
        else:
            print(f"pass  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
