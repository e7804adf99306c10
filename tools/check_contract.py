"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at a given SF and compare to its DuckDB oracle
(row count, column names, order-insensitive values)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    spark = get_spark(cores=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = E.queries(), E.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failed = []
    for name, fn in qs.items():
        got = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(got)} rows")
            continue
        want = con.execute(oracles[name]).fetchdf()
        g, w = norm(got), norm(want)
        ok = list(g.columns) == list(w.columns) and len(g) == len(w)
        if ok:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, atol=0, rtol=0)
            except AssertionError as e:
                ok = False
                err = str(e).splitlines()[:6]
        if ok:
            print(f"{name:24s} OK ({len(g)} rows)")
        else:
            failed.append(name)
            print(f"{name:24s} FAIL: spark={len(g)}x{list(g.columns)} duck={len(w)}x{list(w.columns)}")
            if list(g.columns) == list(w.columns) and len(g) == len(w):
                for line in err:
                    print("   ", line)
                diff = (g != w).any(axis=1)
                print(pd.concat([g[diff].head(3), w[diff].head(3)], axis=1))
    spark.stop()
    print("FAILED:" if failed else "ALL OK", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
