"""Driver-style cross-check: run every __spark_entry__ query against its
DuckDB oracle at a given sf dir, compare row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from bm25_pagerank_rpi_spark.session import get_spark

    spark = get_spark(cores=8, app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    t_sweep = time.time()
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        t_pair = time.time()
        sql = e.oracle_sql().get(name)
        try:
            got_df = fn(spark, sf_dir)
            got_cols = sorted(got_df.columns)
            got = sorted(
                tuple(norm_cell(row[c]) for c in got_cols) for row in got_df.collect()
            )
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if sql is None:
            print(f"rows-only {name}: {len(got)} rows")
            continue
        try:
            exp_rel = con.execute(sql)
            exp_cols_raw = [d[0] for d in exp_rel.description]
            rows = exp_rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        order = sorted(range(len(exp_cols_raw)), key=lambda i: exp_cols_raw[i])
        exp_cols = sorted(exp_cols_raw)
        exp = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={exp_cols}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            failures += 1
            continue
        bad = [(g, x) for g, x in zip(got, exp) if g != x]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows ({time.time() - t_pair:.1f}s)")
    print(f"sweep total: {time.time() - t_sweep:.1f}s, failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
