"""Dedup / similarity / text-analysis operators: semantic unit tests
(the DuckDB cross-engine check lives in test_entry_oracles.py)."""

import math

import pytest
from pyspark.sql import functions as F

from limetrans_spark.functions.text import text_profile
from limetrans_spark.operators import ann, dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup
    (3, "completely different content about spark engines"),
    (4, "der schnelle braune fuchs und die faule katze und der hund ist nicht da"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in dedup.exact_dedup(docs).collect()}
    assert out[1]["canonical_id"] == 0 and out[1]["is_dup"] == 1
    assert out[0]["is_dup"] == 0
    assert out[2]["is_dup"] == 0  # near-dup is NOT an exact dup


def test_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.7
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_exact_and_near(docs):
    cands = {
        (r["id_a"], r["id_b"]): r["n_bands_matched"]
        for r in dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=4).collect()
    }
    assert cands[(0, 1)] == 4  # identical docs collide in every band
    assert not any((a == 3 or b == 3) for a, b in cands)


def test_simhash_properties(docs):
    out = {r["id"]: r["simhash"] for r in dedup.simhash(docs, bits=16).collect()}
    assert out[0] == out[1]  # identical docs → identical fingerprint
    assert len(out[0]) == 16 and set(out[0]) <= {"0", "1"}
    ham_near = sum(a != b for a, b in zip(out[0], out[2]))
    ham_far = sum(a != b for a, b in zip(out[0], out[3]))
    assert ham_near <= ham_far


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.0, 0.9, 0.2], 1),
        (4, [-1.0, 0.0, 0.0], 2),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk(vecs):
    out = ann.cosine_topk(vecs, [1.0, 0.0, 0.0], k=3, exclude_id=0).collect()
    assert [r["id"] for r in out] == [1, 2, 3]
    assert abs(out[0]["cosine"] - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-5


def test_ivf_prunes_to_best_cluster(vecs):
    out = ann.ivf_topk(vecs, [1.0, 0.0, 0.0], k=3, nprobe=1, exclude_id=0).collect()
    assert [r["id"] for r in out] == [1]  # only cluster 0 scanned
    out2 = ann.ivf_topk(vecs, [1.0, 0.0, 0.0], k=3, nprobe=2, exclude_id=0).collect()
    assert [r["id"] for r in out2] == [1, 2, 3]


def test_embedding_near_dup(vecs):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs(vecs, threshold=0.9).collect()
    }
    assert (0, 1) in pairs and all(v >= 0.9 for v in pairs.values())


def test_text_profile(docs):
    prof = {r["doc_id"]: r for r in text_profile(docs).collect()}
    p0 = prof[0]
    assert p0["n_tokens"] == 9
    assert abs(p0["stopword_ratio"] - 2 / 9) < 1e-6  # 'the' ×2; 'over' not a stopword
    assert p0["langid"] == "en"
    assert prof[4]["langid"] == "de"
    assert prof[0]["fingerprint"] == prof[1]["fingerprint"]
    assert prof[0]["fingerprint"] != prof[2]["fingerprint"]
    assert 0.0 <= p0["quality"] <= 1.0


def test_quality_penalizes_punct(spark):
    df = spark.createDataFrame(
        [(0, "clean readable text with many proper words here today"),
         (1, "!!! ### $$$ %%% ^^^ &&& *** ((( )))")],
        "doc_id long, text string",
    )
    prof = {r["doc_id"]: r["quality"] for r in text_profile(df).collect()}
    assert prof[0] > prof[1]
    assert prof[1] == 0.0
