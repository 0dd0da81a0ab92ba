"""Mimic the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and values (order-insensitive, exact).

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        errs.append(f"rowcount {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        return errs
    if errs:
        return errs
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        # the driver hashes raw pandas values, so dtype KIND drift
        # (int64 vs float64 from un-cast DuckDB HUGEINT sums) is a
        # hash-fail even when values compare equal — flag it here too
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        if ak != bk and {ak, bk} <= {"i", "u", "f"}:
            errs.append(f"col {c}: dtype kind {a[c].dtype} vs {b[c].dtype}")
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            eq = np.array_equal(
                np.asarray(av, dtype=np.float64),
                np.asarray(bv, dtype=np.float64),
                equal_nan=True,
            )
        else:
            eq = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all()
        if not eq:
            mism = np.nonzero(
                ~(pd.Series(av).astype(str) == pd.Series(bv).astype(str)).to_numpy()
            )[0][:3]
            errs.append(
                f"col {c}: first diffs at rows {mism.tolist()}: "
                f"{[(av[i], bv[i]) for i in mism]}"
            )
    return errs


def main():
    import __spark_entry__ as entrymod
    from mosaic_engine.job import make_session

    only = set(sys.argv[1:])
    spark = make_session(cores=8, shuffle_partitions=8, app="oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oq:
            print(f"OK   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oq[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"OK   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
