"""Query semantics vs the pure-Python oracle — the analogue of the
reference's parameterized query suite (``ElasticsearchQueryTest.java:169-298``):
boolean membership, phrase, prefix, and rank-identical BM25 top-k with
scores to 1e-9, across the DataFrame path and the sharded WAND/TAAT paths."""

import pytest

from limetrans_spark.operators import query as Q
from limetrans_spark.operators.build import build_index
from limetrans_spark.sources.corpus import synth_corpus

N_DOCS = 120
ATOL = 1e-9


@pytest.fixture(scope="module")
def index(spark):
    corpus = synth_corpus(spark, N_DOCS, max_tokens=300, partitions=4)
    idx = build_index(corpus, shard_size=32)
    idx.shards.persist()
    idx.docstore.persist()
    return idx


@pytest.fixture(scope="module")
def oracle(index):
    from tests.oracle import OracleIndex

    rows = index.docstore.select("doc_id", "content").collect()
    return OracleIndex.build({r["doc_id"]: r["content"] for r in rows})


RANKED_QUERIES = [
    "tokenize",
    "tokenize score",
    "parse json",
    "license warranties",
    "if return",  # stop-like high-DF terms
]


def assert_topk_equal(got, want):
    assert [g["doc_id"] for g in got] == [d for d, _ in want]
    for g, (_, s) in zip(got, want):
        assert abs(g["score"] - s) < ATOL


@pytest.mark.parametrize("q", RANKED_QUERIES)
def test_bm25_df_path_matches_oracle(index, oracle, q):
    terms = []
    for tok in q.split():
        terms.extend(Q.parse_query(tok).positive_terms)
    want = oracle.topk(terms, 10, operator="and")
    got = Q.bm25_topk_df(index, q, k=10).collect()
    assert_topk_equal(got, want)


@pytest.mark.parametrize("q", ["tokenize score", "license warranties"])
@pytest.mark.parametrize("algorithm", ["wand", "taat"])
def test_bm25_sharded_or_matches_oracle(index, oracle, q, algorithm):
    terms = q.split()
    want = oracle.topk(terms, 10, operator="or")
    got = Q.bm25_topk_sharded(index, q, k=10, operator="or", algorithm=algorithm).collect()
    assert_topk_equal(got, want)


def test_bm25_sharded_and_matches_oracle(index, oracle):
    want = oracle.topk(["tokenize", "score"], 10, operator="and")
    got = Q.bm25_topk_sharded(index, "tokenize score", k=10, operator="and").collect()
    assert_topk_equal(got, want)


def test_graph_equivalence_queries(index):
    """parse-json ≈ parse json ≈ parsejson doc sets (reference hyphen matrix)."""
    a = {r["doc_id"] for r in Q.matching_docs_df(index, "parse json").collect()}
    b = {r["doc_id"] for r in Q.matching_docs_df(index, "parse-json").collect()}
    assert a == b and a


def test_boolean_not(index, oracle):
    got = {r["doc_id"] for r in Q.matching_docs_df(index, "tokenize -license").collect()}
    want = oracle.docs_with("tokenize") - oracle.docs_with("license")
    assert got == want


def test_boolean_or_group(index, oracle):
    got = {r["doc_id"] for r in Q.matching_docs_df(index, "varintencode | deltagap").collect()}
    want = oracle.docs_with("varintencode") | oracle.docs_with("deltagap")
    assert got == want


def test_phrase(index, oracle):
    got = {r["doc_id"] for r in Q.matching_docs_df(index, '"applicable law"').collect()}
    want = oracle.phrase_docs(["applicable", "law"])
    assert got == want and got  # license docs exist


def test_phrase_no_false_adjacency(index, oracle):
    # both terms common, adjacency rare: oracle decides
    got = {r["doc_id"] for r in Q.matching_docs_df(index, '"score tokenize"').collect()}
    assert got == oracle.phrase_docs(["score", "tokenize"])


def test_prefix(index, oracle):
    got = {r["doc_id"] for r in Q.matching_docs_df(index, "varint*").collect()}
    want = set()
    for t in oracle.tf:
        if t.startswith("varint"):
            want |= oracle.docs_with(t)
    assert got == want and got


def test_match_all(index):
    got = Q.bm25_topk_df(index, "", k=1000).collect()
    assert len(got) == N_DOCS


def test_k_cap(index):
    got = Q.bm25_topk_df(index, "if", k=99999).collect()
    assert len(got) <= Q.MAX_HITS


def test_parallelism_rank_identity(spark, index):
    """north_rule: identical ranks + scores at different parallelism.

    Rebuild the same corpus with different partitioning/shuffle width and
    compare full top-20 (ids AND scores bit-for-bit)."""
    corpus2 = synth_corpus(spark, N_DOCS, max_tokens=300, partitions=7)
    idx2 = build_index(corpus2, shard_size=32)
    q = "tokenize score license"
    a = Q.bm25_topk_df(index, q, k=20).collect()
    b = Q.bm25_topk_df(idx2, q, k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    c = Q.bm25_topk_sharded(idx2, "tokenize | score", k=20).collect()
    d = Q.bm25_topk_sharded(index, "tokenize | score", k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in c] == [
        (r["doc_id"], r["score"]) for r in d
    ]
