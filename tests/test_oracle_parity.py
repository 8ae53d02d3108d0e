"""Committed parity evidence for the round-5 oracle twins (review finding):
the four DuckDB oracle SQL generators whose engine twin involves nontrivial
shared math (md5-derived minhash permutations, simhash banding, seeded
hyperplane ANN, per-field BM25 CTEs) are pinned here against the Spark
engine on the sf0.001 driver tables — any one-sided drift in the ~100-line
SQL twins fails pytest instead of surfacing as a driver grading failure.

Same comparison the driver performs: row count, column names, and
order-insensitive values (sorted by column name, floats rounded)."""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "ann_lsh_topk",
    "bm25_topk_fields",
]


def _norm(rows, cols):
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


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", QUERIES)
def test_round5_oracle_twin_parity(spark, oracle_con, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(e.oracle_sql()[name])
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(oracle_cols)
    assert len(spark_rows) == len(oracle_rows)
    assert _norm(spark_rows, spark_cols) == _norm(oracle_rows, oracle_cols)
