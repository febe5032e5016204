"""Deletion path (bulk delete + deletion-literal) and skew telemetry."""

import pytest
from pyspark.sql import functions as F

from limetrans_spark.operators import query as Q
from limetrans_spark.operators.build import build_index, skew_report
from limetrans_spark.plans.lifecycle import apply_deletes
from limetrans_spark.sources.corpus import synth_corpus


@pytest.fixture(scope="module")
def index(spark):
    return build_index(synth_corpus(spark, 80, max_tokens=150, partitions=4), shard_size=32)


def test_apply_deletes(spark, index):
    hits_before = {r["doc_id"] for r in Q.matching_docs_df(index, "tokenize").collect()}
    assert hits_before
    victim = sorted(hits_before)[0]
    idx2 = apply_deletes(index, spark.createDataFrame([(victim,)], "doc_id long"))
    hits_after = {r["doc_id"] for r in Q.matching_docs_df(idx2, "tokenize").collect()}
    assert hits_after == hits_before - {victim}
    assert idx2.n_docs == index.n_docs - 1
    # scores reflect the new N/avgdl (deleted doc can't appear in top-k)
    top = Q.bm25_topk_df(idx2, "tokenize", k=1000).collect()
    assert victim not in {r["doc_id"] for r in top}
    # sharded path agrees on the shrunken index
    a = Q.bm25_topk_df(idx2, "tokenize score", k=10).collect()
    b = Q.bm25_topk_sharded(idx2, "tokenize score", k=10, operator="and").collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b]


def test_deletion_literal(spark, index):
    # delete all python files via the deletion-literal trigger
    py_ids = {r["doc_id"] for r in index.docstore.filter(F.col("lang") == "py").select("doc_id").collect()}
    empty = spark.createDataFrame([], "doc_id long")
    idx2 = apply_deletes(index, empty, deletion_literal=("lang", "py"))
    assert idx2.n_docs == index.n_docs - len(py_ids)
    left = {r["doc_id"] for r in idx2.docstore.select("doc_id").collect()}
    assert left.isdisjoint(py_ids)


def test_skew_report(index):
    rep = skew_report(index.terms, index.n_docs, top=5)
    assert len(rep) == 5
    # sorted by df desc; license-boilerplate/keyword terms dominate
    dfs = [r["df"] for r in rep]
    assert dfs == sorted(dfs, reverse=True)
    assert all(0.0 <= r["doc_share"] <= 1.0 for r in rep)


def test_salted_agg_exact_and_spread(spark):
    """Salted two-phase aggregation equals the plain groupBy exactly
    (algebraic aggregates) and spreads a zipfian hot key over many
    phase-1 groups."""
    from limetrans_spark.operators.skew import salted_agg

    rows = [("hot", float(i % 7)) for i in range(20000)] + [
        (f"k{i % 50}", float(i)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(16)
    got = {
        r["k"]: (r["n"], r["total"], r["vmax"])
        for r in salted_agg(
            df, ["k"], {"n": ("count", "*"), "total": ("sum", "v"), "vmax": ("max", "v")}
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["total"], r["vmax"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("vmax"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0] and got[k][2] == want[k][2]
        assert abs(got[k][1] - want[k][1]) < 1e-6 * max(1.0, abs(want[k][1]))
    # the hot key's phase-1 partials spread over >1 salt group
    from limetrans_spark.operators.skew import salted_agg as _sa  # noqa: F401
    p1 = (
        df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(16)))
        .groupBy("k", "_salt").count().filter(F.col("k") == "hot").count()
    )
    assert p1 > 4

    from limetrans_spark.operators.skew import salted_broadcast_left

    small = spark.createDataFrame([("hot", 1), ("k3", 2)], "k string, tag int")
    joined = salted_broadcast_left(df, small, "k")
    assert joined.count() == 20000 + 40  # hot rows + k3 rows
