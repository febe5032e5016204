"""Rehearsal of the driver's correctness gate: run a representative subset
of __spark_entry__ queries on Spark AND DuckDB at sf0.001 and compare
row count + sorted-column schema + order-insensitive canonical values.
(The full 30-query sweep is tools/check_oracles.py, run at sf0.01.)"""

import sys

import duckdb
import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from tools.check_oracles import TABLES, rows_canon

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "ft_df",
    "ft_bm25_topk",
    "ft_phrase",
    "ft_boolean",
    "ft_phrase_slop",
    "ft_stopword",
    "nested_record_json",
    "dedup_exact",
    "dedup_minhash",
    "ann_topk",
    "text_profile",
    "tpch_q1",
    "window_topn",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_pair(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert rows_canon(scols, srows) == rows_canon(ocols, orows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "score"}


def test_queries_have_oracles():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(qs) - set(oracles)
    assert not missing, f"queries without oracle SQL: {missing}"
