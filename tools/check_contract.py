"""Local stand-in for the driver's correctness gate: run each queries()[name]
and its oracle_sql()[name] at a given sf dir, compare row-count, column
names, and order-insensitive values (sorted by column name, rounded).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        vals = []
        for c in sorted(cols):
            v = d[c]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from engine.session import get_spark

    spark = get_spark("contract-check", cores=16, shuffle_partitions=16)

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        spark_cols = df.columns
        spark_rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            print(f"{name}: rows-only check, {len(spark_rows)} rows")
            continue
        res = con.execute(oracles[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ok_count = len(spark_rows) == len(duck_rows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = norm(spark_rows, spark_cols) == norm(duck_rows, duck_cols)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{name}: {status} rows={len(spark_rows)}/{len(duck_rows)} "
            f"cols={'ok' if ok_cols else f'{sorted(spark_cols)} vs {sorted(duck_cols)}'} "
            f"vals={'ok' if ok_vals else 'MISMATCH'}"
        )
        if status == "FAIL":
            failed.append(name)
            if ok_cols and ok_count:
                a = norm(spark_rows, spark_cols)
                b = norm(duck_rows, duck_cols)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diff:
                    print(f"   spark={x}\n   duck ={y}")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
