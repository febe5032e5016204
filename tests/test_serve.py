"""Serving tier: LocalSearcher answers from loaded artifacts, rank- and
score-identical to the Spark paths, at interactive latency."""

import time

import pytest

from limetrans_spark.operators import query as Q
from limetrans_spark.operators.build import build_index
from limetrans_spark.operators.serve import LocalSearcher
from limetrans_spark.sources.corpus import synth_corpus


@pytest.fixture(scope="module")
def index(spark):
    idx = build_index(synth_corpus(spark, 150, max_tokens=250, partitions=4), shard_size=64)
    idx.shards.persist(); idx.postings.persist()
    return idx


@pytest.fixture(scope="module")
def searcher(index):
    return LocalSearcher.from_index(index)


QUERIES = [
    ("tokenize score", "and"),
    ("tokenize | score", "or"),
    ('"applicable law" license', "and"),
    ("varint* -license", "and"),
    ("tokenizr~1", "and"),
]


@pytest.mark.parametrize("q,op", QUERIES)
def test_serving_matches_spark_paths(index, searcher, q, op):
    want = [
        (r["doc_id"], r["score"])
        for r in Q.bm25_topk_sharded(index, q, k=15, operator=op).collect()
    ]
    got = searcher.search(q, k=15, operator=op)
    assert got == want  # bit-exact


def test_serving_latency(searcher):
    searcher.search("tokenize score", k=10)  # warm decode cache
    t0 = time.time()
    n = 50
    for _ in range(n):
        searcher.search("tokenize | score", k=10, operator="or")
    per_q = (time.time() - t0) / n * 1000
    assert per_q < 50, f"serving query took {per_q:.1f} ms"


def test_serving_k_cap_and_empty(searcher):
    assert searcher.search("zzznope", k=5) == []
    with pytest.raises(ValueError):
        searcher.search("-tokenize", k=5)
