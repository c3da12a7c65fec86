"""Full driver replica for the CORRECTNESS gate.

Runs every ``__spark_entry__.queries()`` entry on a VANILLA SparkSession
(``SparkSession.builder.master(...).getOrCreate()`` — none of the repo's
``get_spark`` confs, the way the correctness driver builds its session)
against its DuckDB oracle at the given sf dir, comparing row count,
sorted column list, and exact values (the driver's canonicalization:
sort columns by name, stringify objects, round floats, sort rows).

Usage:  python scripts/correctness_replica.py [sf_dir]

Exits non-zero and prints one line per mismatching query; prints a
single OK summary line otherwise. This is the pre-flight the r4
``pages_meta`` regression showed we need: the repo test suite runs on
the repo session factory, so a runtime-conf dependency is invisible to
it — only a vanilla-session replay of the full catalog catches that
class before the driver does.
"""

from __future__ import annotations

import json
import sys
import traceback

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query-name filter

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness_replica")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    import __spark_entry__ as e

    queries = e.queries()
    oracles = e.oracle_sql()

    failures: list[str] = []
    for name in queries:
        if only and name not in only:
            continue
        try:
            got = _canon(queries[name](spark, sf_dir).toPandas())
        except Exception:
            failures.append(f"{name}: SPARK ERR {traceback.format_exc(limit=3)}")
            continue
        if name not in oracles:
            print(json.dumps({"q": name, "rows": len(got), "oracle": None}))
            continue
        try:
            want = _canon(con.sql(oracles[name]).df())
        except Exception:
            failures.append(f"{name}: ORACLE ERR {traceback.format_exc(limit=3)}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append(
                f"{name}: columns {list(got.columns)} != {list(want.columns)}"
            )
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, rtol=0, atol=0
            )
        except AssertionError as exc:
            failures.append(f"{name}: values differ — {str(exc)[:300]}")
            continue
        print(json.dumps({"q": name, "rows": len(got), "match": True}))

    spark.stop()
    n_run = len(only & set(queries)) if only else len(queries)
    if failures:
        print(f"\nFAIL {len(failures)}/{n_run}:")
        for f in failures:
            print(" -", f)
        return 1
    print(f"\nOK: {n_run} queries match at {sf_dir} on a vanilla session")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
