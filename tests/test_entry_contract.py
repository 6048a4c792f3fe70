"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.001, compare row counts,
schemas (column names), and values (order-insensitive). Normalization
lives in osmospark.oraclecmp, shared with scripts/oracle_sweep.py."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from osmospark.oraclecmp import TABLES, norm_rows

SF_DIR = __import__("os").environ.get("OSMO_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    s_cols, s_norm = norm_rows(scols, srows)
    d_cols, d_norm = norm_rows(dcols, drows)
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} vs oracle {len(d_norm)}")
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first: "
        f"{mismatches[0]}")


def test_every_query_is_oracle_backed():
    """Round 2 closed the last rows-only gaps (ann_lsh via literal planes,
    media_features via the formulaic fake-decoder arithmetic): every
    queries() entry must now have a DuckDB oracle."""
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
