"""Fielded search: per-field postings + copy_to + field:term syntax +
per-field BM25 spaces (reference: fielded queries in
ElasticsearchQueryTest.java:57-61, copy_to DAG in hbztitle-mapping)."""

import math

import pytest
from pyspark.sql import functions as F

from limetrans_spark.operators import fielded as FL
from limetrans_spark.operators.build import BM25_B, BM25_K1
from limetrans_spark.operators.query import bm25_idf

DOCS = [
    (0, "hash join strategies", "smith adams", "en"),
    (1, "merge join and sort", "jones", "en"),
    (2, "hash aggregation notes", "smith", "de"),
    (3, "btree index scan", "garcia smith", "es"),
    (4, "join ordering heuristics", "adams", "de"),
]


@pytest.fixture(scope="module")
def fidx(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, title string, author string, lang string")
    return FL.build_fielded_index(
        df,
        fields={"title": "title", "author": "author", "lang": "lang"},
        copy_to={"title": ["all"], "author": ["all"]},
    )


def test_per_field_stats(fidx):
    # every doc has all three source fields; 'all' carries title+author
    assert fidx.stats["title"][0] == 5 and fidx.stats["author"][0] == 5
    assert fidx.stats["all"][0] == 5
    # avgdl(title) = mean token counts: (3+4+3+3+3)/5
    assert abs(fidx.stats["title"][1] - 16 / 5) < 1e-12
    # copy_to: 'all' dl = title dl + author dl per doc
    dl = {
        (r["doc_id"], r["field"]): r["dl"] for r in fidx.doclens.collect()
    }
    for d in range(5):
        assert dl[(d, "all")] == dl[(d, "title")] + dl[(d, "author")]


def test_field_scoped_term(fidx):
    # 'smith' appears in author (docs 0,2,3) but never in title
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "author:smith", k=10).collect()}
    assert hits == {0, 2, 3}
    assert FL.bm25_topk_fielded(fidx, "title:smith", k=10).count() == 0
    # default field = 'all' catches copied tokens
    hits_all = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "smith", k=10).collect()}
    assert hits_all == {0, 2, 3}


def test_cross_field_and_or_not(fidx):
    # AND across fields
    hits = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded(fidx, "author:smith lang:de", k=10).collect()
    }
    assert hits == {2}
    # OR group
    hits = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded(fidx, "lang:es | lang:de", k=10).collect()
    }
    assert hits == {2, 3, 4}
    # NOT
    hits = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded(fidx, "title:join -author:adams", k=10).collect()
    }
    assert hits == {1}


def test_field_prefix_and_phrase(fidx):
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "title:ha*", k=10).collect()}
    assert hits == {0, 2}
    # fielded phrase (AND-within-field relaxation)
    hits = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded(fidx, 'title:"hash join"', k=10).collect()
    }
    assert hits == {0}


def test_per_field_bm25_score(fidx):
    """Hand-computed BM25 in the author field's scoring space."""
    got = {r["doc_id"]: r["score"] for r in FL.bm25_topk_fielded(fidx, "author:smith", k=10).collect()}
    n_docs, avgdl = fidx.stats["author"]
    idf = bm25_idf(n_docs, 3)  # smith df=3 in author
    for doc, dl in [(0, 2), (2, 1), (3, 2)]:
        norm = BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
        want = idf * 1.0 * (BM25_K1 + 1.0) / (1.0 + norm)
        assert abs(got[doc] - want) < 1e-12


def test_copy_to_position_gap(spark):
    """Tokens copied from different sources must not form phrases across
    the source boundary (position gap)."""
    df = spark.createDataFrame(
        [(0, "alpha beta", "gamma delta")], "doc_id long, t1 string, t2 string"
    )
    fidx = FL.build_fielded_index(
        df, fields={"t1": "t1", "t2": "t2"}, copy_to={"t1": ["all"], "t2": ["all"]}
    )
    # all-field contains all four tokens
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "beta gamma", k=10).collect()}
    assert hits == {0}


def test_local_fielded_searcher_matches_df_path(fidx):
    """Serving tier ≡ DataFrame path for fielded queries: same docs,
    same scores to 1e-9, same tie-break."""
    s = FL.LocalFieldedSearcher.from_index(fidx)
    for q in [
        "author:smith",
        "author:smith lang:de",
        "lang:es | lang:de",
        "title:join -author:adams",
        "title:ha*",
        'title:"hash join"',
        "smith",  # default field (copy_to catch-all)
    ]:
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(fidx, q, k=15).collect()]
        b = s.search(q, k=15)
        assert [d for d, _ in a] == [d for d, _ in b], q
        for (_, sa), (_, sb) in zip(a, b):
            assert abs(sa - sb) < 1e-9, q


def test_fielded_rank_identity_across_partitionings(spark):
    """North-rule invariant extended to the fielded path: identical docs
    AND scores at different input partitionings."""
    rows = [
        (i, f"term{i % 7} hash join w{i}", f"author{i % 5} smith", ["en", "de", "es"][i % 3])
        for i in range(60)
    ]
    a = FL.build_fielded_index(
        spark.createDataFrame(rows, "doc_id long, title string, author string, lang string").repartition(3),
        fields={"title": "title", "author": "author", "lang": "lang"},
        copy_to={"title": ["all"], "author": ["all"]},
    )
    b = FL.build_fielded_index(
        spark.createDataFrame(rows, "doc_id long, title string, author string, lang string").repartition(11),
        fields={"title": "title", "author": "author", "lang": "lang"},
        copy_to={"title": ["all"], "author": ["all"]},
    )
    assert a.stats == b.stats
    for q in ["author:smith lang:de", "hash join", "title:term1 | title:term2"]:
        ra = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(a, q, k=20).collect()]
        rb = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(b, q, k=20).collect()]
        assert ra == rb, q


def test_fielded_sharded_matches_df_tier(spark):
    """Per-field sharded indexes reproduce the DataFrame fielded tier
    bit-exactly (same per-field stats by construction) for term/prefix/
    boolean queries, and add TRUE positional phrases per field."""
    df = spark.createDataFrame(DOCS, "doc_id long, title string, author string, lang string")
    fidx = FL.build_fielded_index(
        df,
        fields={"title": "title", "author": "author", "lang": "lang"},
        copy_to={"title": ["all"], "author": ["all"]},
    )
    sidx = FL.build_fielded_sharded(
        df,
        fields={"title": "title", "author": "author", "lang": "lang"},
        copy_to={"title": ["all"], "author": ["all"]},
        shard_size=4,
    )
    assert set(sidx) == {"title", "author", "lang", "all"}
    # stats agree field by field (docCount, exact avgdl)
    for f, (dc, avgdl) in fidx.stats.items():
        assert sidx[f].n_docs == dc and abs(sidx[f].avgdl - avgdl) < 1e-15, f
    for q in [
        "author:smith",
        "author:smith lang:de",
        "lang:es | lang:de",
        "title:join -author:adams",
        "title:ha*",
        "smith",
    ]:
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(fidx, q, k=15).collect()]
        b = [
            (r["doc_id"], r["score"])
            for r in FL.bm25_topk_fielded_sharded(sidx, q, k=15).collect()
        ]
        assert [d for d, _ in a] == [d for d, _ in b], q
        for (_, sa), (_, sb) in zip(a, b):
            assert abs(sa - sb) < 1e-9, q
    # true positional phrase within a field on the sharded tier
    hits = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded_sharded(sidx, 'title:"hash join"', k=15).collect()
    }
    assert hits == {0}
    assert (
        FL.bm25_topk_fielded_sharded(sidx, 'title:"join hash"', k=15).count() == 0
    )  # order matters — the DF tier's AND relaxation would match doc 0
    # single-field ranked queries route straight to that field's
    # compressed WAND machinery
    from limetrans_spark.operators import query as Q

    wand = [
        (r["doc_id"], round(r["score"], 9))
        for r in Q.bm25_topk_sharded(sidx["author"], "smith | adams", k=15).collect()
    ]
    assert {d for d, _ in wand} == {0, 2, 3, 4}  # smith docs ∪ adams docs


def test_fielded_snapshot_roundtrip(spark, tmp_path):
    """save_fielded/load_fielded: published per-field snapshots answer
    fielded queries identically to the in-memory build."""
    from limetrans_spark.plans.lifecycle import load_fielded, save_fielded

    df = spark.createDataFrame(DOCS, "doc_id long, title string, author string, lang string")
    sidx = FL.build_fielded_sharded(
        df,
        fields={"title": "title", "author": "author", "lang": "lang"},
        copy_to={"title": ["all"], "author": ["all"]},
        shard_size=4,
    )
    root = str(tmp_path / "froot")
    save_fielded(sidx, root, "code", "g1")
    loaded = load_fielded(spark, root)
    assert set(loaded) == set(sidx)
    for q in ["author:smith lang:de", "smith", "title:ha*"]:
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded_sharded(sidx, q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded_sharded(loaded, q, k=10).collect()]
        assert a == b, q
