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
    # fielded phrase (positional since round 3)
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
    )  # order matters (the DF tier is positional too since round 3)
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


def test_fielded_positional_phrase_df_and_serving(fidx):
    """TRUE positional phrases on the DataFrame AND serving tiers:
    order matters (the old AND-within-field relaxation would match the
    reversed phrase too)."""
    hits = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded(fidx, 'title:"hash join"', k=10).collect()
    }
    assert hits == {0}
    assert FL.bm25_topk_fielded(fidx, 'title:"join hash"', k=10).count() == 0
    s = FL.LocalFieldedSearcher.from_index(fidx)
    assert {d for d, _ in s.search('title:"hash join"', k=10)} == {0}
    assert s.search('title:"join hash"', k=10) == []


def test_copy_gap_blocks_cross_source_phrase(spark):
    """COPY_GAP proof: a phrase straddling two copy_to sources must NOT
    match positionally in the catch-all field, while each source's own
    phrases still do."""
    df = spark.createDataFrame(
        [(0, "alpha beta", "gamma delta")], "doc_id long, t1 string, t2 string"
    )
    fidx = FL.build_fielded_index(
        df, fields={"t1": "t1", "t2": "t2"}, copy_to={"t1": ["all"], "t2": ["all"]}
    )
    assert FL.bm25_topk_fielded(fidx, '"beta gamma"', k=10).count() == 0
    assert {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, '"alpha beta"', k=10).collect()} == {0}
    assert {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, '"gamma delta"', k=10).collect()} == {0}
    s = FL.LocalFieldedSearcher.from_index(fidx)
    assert s.search('"beta gamma"', k=10) == []
    assert {d for d, _ in s.search('"gamma delta"', k=10)} == {0}


def test_per_field_analyzers_stemmed_vs_unstemmed(spark):
    """The reference maps bib.namePersonal to the unstemmed analyzer
    while the catch-all stems (hbztitle-mapping-v8.json:33-37): a
    stemmed field matches morphological variants, the unstemmed field
    does not — and query terms are analyzed per-FIELD."""
    df = spark.createDataFrame(
        [
            (0, "merge queries fast", "exact tables"),
            (1, "merged query slow", "table exact"),
            (2, "sort scan", "nothing here"),
        ],
        "doc_id long, body string, kw string",
    )
    fidx = FL.build_fielded_index(
        df,
        fields={"body": ("body", "simple_stem"), "kw": ("kw", "simple")},
    )
    assert fidx.analyzers == {"body": "simple_stem", "kw": "simple"}
    # 'queries' and 'query' both stem to 'queri' → stemmed field unifies
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "body:query", k=10).collect()}
    assert hits == {0, 1}
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "body:queries", k=10).collect()}
    assert hits == {0, 1}
    # unstemmed field distinguishes surface forms
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "kw:tables", k=10).collect()}
    assert hits == {0}
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "kw:table", k=10).collect()}
    assert hits == {1}
    # dl discounts stem overlap tokens: body dl = surface token count
    dl = {(r["doc_id"], r["field"]): r["dl"] for r in fidx.doclens.collect()}
    assert dl[(0, "body")] == 3 and dl[(1, "body")] == 3 and dl[(2, "body")] == 2


def test_per_field_analyzers_three_tier_equality(spark):
    """Two-analyzer fielded index: DataFrame, serving, and sharded tiers
    agree on docs AND scores, including stemmed-field clauses, fuzzy,
    prefix, and positional phrases."""
    rows = [
        (i, f"merge{'' if i % 2 else 'd'} queries w{i} fast", f"k{i % 3} exact")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string, kw string")
    fields = {"body": ("body", "simple_stem"), "kw": ("kw", "simple")}
    fidx = FL.build_fielded_index(df, fields=fields, copy_to={"kw": ["all"]})
    sidx = FL.build_fielded_sharded(df, fields=fields, copy_to={"kw": ["all"]}, shard_size=5)
    assert sidx["body"].metrics["analyzer"] == "simple_stem"
    srv = FL.LocalFieldedSearcher.from_index(fidx)
    for q in [
        "body:query",           # stemmed unification
        "body:merge kw:exact",  # cross-field AND, 'merged' stems to 'merg'
        "kw:k1 | kw:k2",
        "body:quer*",           # prefix on the stemmed field
        "body:mergd~1",         # fuzzy expansion, scored on expansions
        'body:"queries w2"',    # positional fielded phrase
        "exact",                # default (copy_to) field
    ]:
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(fidx, q, k=20).collect()]
        b = srv.search(q, k=20)
        c = [
            (r["doc_id"], r["score"])
            for r in FL.bm25_topk_fielded_sharded(sidx, q, k=20).collect()
        ]
        assert [d for d, _ in a] == [d for d, _ in b] == [d for d, _ in c], q
        for (_, sa), (_, sb), (_, sc) in zip(a, b, c):
            assert abs(sa - sb) < 1e-9 and abs(sa - sc) < 1e-9, q


def test_unknown_field_lenient_on_all_tiers(fidx, spark):
    """A typo'd field name matches nothing — identically on all three
    tiers, never a crash (ES unmapped-field leniency)."""
    df = spark.createDataFrame(DOCS, "doc_id long, title string, author string, lang string")
    sidx = FL.build_fielded_sharded(
        df,
        fields={"title": "title", "author": "author", "lang": "lang"},
        copy_to={"title": ["all"], "author": ["all"]},
        shard_size=4,
    )
    srv = FL.LocalFieldedSearcher.from_index(fidx)
    for q in ["typo:smith", "author:smith typo:x", "typo:x | author:smith"]:
        a = [(r["doc_id"], round(r["score"], 9)) for r in FL.bm25_topk_fielded(fidx, q, k=10).collect()]
        b = [(d, round(s, 9)) for d, s in srv.search(q, k=10)]
        c = [
            (r["doc_id"], round(r["score"], 9))
            for r in FL.bm25_topk_fielded_sharded(sidx, q, k=10).collect()
        ]
        assert a == b == c, (q, a, b, c)
    # pure-unknown AND clause → empty everywhere
    assert FL.bm25_topk_fielded(fidx, "typo:smith", k=10).count() == 0


def test_copy_to_unknown_source_raises(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, t1 string")
    with pytest.raises(ValueError, match="nosuch"):
        FL.build_fielded_index(df, fields={"t1": "t1"}, copy_to={"nosuch": ["all"]})
    with pytest.raises(ValueError, match="nosuch"):
        FL.build_fielded_sharded(df, fields={"t1": "t1"}, copy_to={"nosuch": ["all"]})


def test_copy_gap_blocks_cross_source_phrase_sharded(spark):
    """Round-3 parity: the SHARDED tier's copy_to targets index the
    gapped token-stream union (build_index_from_tokens), so a phrase
    straddling two sources is unsatisfiable there too — no tier
    deviation left — while tf/df/dl/scores stay bit-equal to the DF
    tier."""
    df = spark.createDataFrame(
        [(0, "alpha beta", "gamma delta"), (1, "beta gamma", "x y")],
        "doc_id long, t1 string, t2 string",
    )
    fields = {"t1": "t1", "t2": "t2"}
    copy_to = {"t1": ["all"], "t2": ["all"]}
    fidx = FL.build_fielded_index(df, fields=fields, copy_to=copy_to)
    sidx = FL.build_fielded_sharded(df, fields=fields, copy_to=copy_to, shard_size=4)
    # doc 1 really contains "beta gamma" in ONE source → matches; doc 0
    # only across the t1|t2 boundary → must NOT match, on either tier
    for q in ['"beta gamma"', '"alpha beta"', '"gamma delta"', "beta | gamma"]:
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(fidx, q, k=10).collect()]
        b = [
            (r["doc_id"], r["score"])
            for r in FL.bm25_topk_fielded_sharded(sidx, q, k=10).collect()
        ]
        assert [d for d, _ in a] == [d for d, _ in b], q
        for (_, sa), (_, sb) in zip(a, b):
            assert abs(sa - sb) < 1e-9, q
    assert {
        r["doc_id"] for r in FL.bm25_topk_fielded_sharded(sidx, '"beta gamma"', k=10).collect()
    } == {1}
    # per-field stats equality (dl = distinct slots on both tiers)
    for f, (dc, avgdl) in fidx.stats.items():
        assert sidx[f].n_docs == dc and abs(sidx[f].avgdl - avgdl) < 1e-12, f


def test_fielded_snapshot_roundtrip_preserves_analyzers(spark, tmp_path):
    """save_fielded/load_fielded keeps each field's analyzer in the
    snapshot manifest metrics, so the loaded index still analyzes query
    terms per-field (a stemmed field keeps matching morphological
    variants after a restart)."""
    from limetrans_spark.plans.lifecycle import load_fielded, save_fielded

    df = spark.createDataFrame(
        [(0, "merge queries fast", "exact tables"), (1, "merged query slow", "table exact")],
        "doc_id long, body string, kw string",
    )
    sidx = FL.build_fielded_sharded(
        df,
        fields={"body": ("body", "simple_stem"), "kw": ("kw", "simple")},
        copy_to={"kw": ["all"]},
        shard_size=4,
    )
    root = str(tmp_path / "froot2")
    save_fielded(sidx, root, "code", "g1")
    loaded = load_fielded(spark, root)
    assert loaded["body"].metrics["analyzer"] == "simple_stem"
    assert loaded["all"].metrics["analyzer"] == "simple"
    for q in ["body:query", "body:queries kw:exact", "exact"]:
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded_sharded(sidx, q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded_sharded(loaded, q, k=10).collect()]
        assert a == b and len(a) > 0, q


def test_declared_field_also_copy_target_gap_parity(spark):
    """A declared field that is ALSO a copy_to target keeps its direct
    stream in position slot 0; copy sources start at (i+1)*COPY_GAP, so
    the first copy source cannot share the direct stream's position
    space (ADVICE r3: offset-0 collision caused false cross-stream
    phrases, dl undercount, and a DF-vs-sharded tf divergence when both
    streams emitted identical (term,pos) pairs)."""
    # doc 0: direct 'all' text = "alpha beta", t1 copy = "beta gamma".
    # Pre-fix, copy source 0 also sat at offset 0, so alpha@0(direct) +
    # gamma@1(copy) formed a false phrase "alpha gamma".
    # doc 1: direct ≡ copy token-for-token — pre-fix, identical
    # (term,pos) pairs collapsed under count_distinct(pos).
    df = spark.createDataFrame(
        [(0, "beta gamma", "alpha beta"), (1, "x y", "x y")],
        "doc_id long, t1 string, alltxt string",
    )
    fields = {"t1": "t1", "all": "alltxt"}
    copy_to = {"t1": ["all"]}
    fidx = FL.build_fielded_index(df, fields=fields, copy_to=copy_to)
    sidx = FL.build_fielded_sharded(df, fields=fields, copy_to=copy_to, shard_size=4)

    # no false phrase across direct/copy streams, on any tier
    assert FL.bm25_topk_fielded(fidx, '"alpha gamma"', k=10).count() == 0
    assert FL.bm25_topk_fielded_sharded(sidx, '"alpha gamma"', k=10).count() == 0
    srv = FL.LocalFieldedSearcher.from_index(fidx)
    assert srv.search('"alpha gamma"', k=10) == []
    # real phrases inside one stream still match
    for q in ['"alpha beta"', '"beta gamma"']:
        assert {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, q, k=10).collect()} == {0}, q

    # dl counts BOTH streams' slots: doc0 all = 2 direct + 2 copy = 4;
    # doc1 all = 2 + 2 = 4 even though the token streams are identical
    dl = {(r["doc_id"], r["field"]): r["dl"] for r in fidx.doclens.collect()}
    assert dl[(0, "all")] == 4 and dl[(1, "all")] == 4
    for f, (dc, avgdl) in fidx.stats.items():
        assert sidx[f].n_docs == dc and abs(sidx[f].avgdl - avgdl) < 1e-12, f

    # tf parity DF vs sharded on the identical-streams doc (term 'x':
    # direct x@0 + copy x@COPY_GAP → tf=2 on both tiers) + score parity
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in fidx.postings.where(F.col("field") == "all").collect()
    }
    assert tf[(1, "x")] == 2 and tf[(0, "beta")] == 2
    for q in ["x", "beta", "all:beta", '"x y"']:
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(fidx, q, k=10).collect()]
        b = [
            (r["doc_id"], r["score"])
            for r in FL.bm25_topk_fielded_sharded(sidx, q, k=10).collect()
        ]
        c = srv.search(q, k=10)
        assert [d for d, _ in a] == [d for d, _ in b] == [d for d, _ in c], q
        for (_, sa), (_, sb), (_, sc) in zip(a, b, c):
            assert abs(sa - sb) < 1e-9 and abs(sa - sc) < 1e-9, q


def test_fielded_phrase_slop_three_tiers(spark):
    """'field:"a b"~N' sloppy phrase on the fielded DF, serving, and
    sharded tiers: same docs, same scores; slop can't bridge the
    COPY_GAP between copy_to source streams."""
    df = spark.createDataFrame(
        [
            (0, "hash join strategies", "x"),
            (1, "hash fast join", "y"),          # gap 1
            (2, "hash one two join", "z"),       # gap 2
            (3, "join before hash", "w"),        # wrong order
        ],
        "doc_id long, title string, kw string",
    )
    fields = {"title": "title", "kw": "kw"}
    fidx = FL.build_fielded_index(df, fields=fields, copy_to={"title": ["all"], "kw": ["all"]})
    sidx = FL.build_fielded_sharded(df, fields=fields, copy_to={"title": ["all"], "kw": ["all"]}, shard_size=4)
    srv = FL.LocalFieldedSearcher.from_index(fidx)
    want = {
        'title:"hash join"': {0},
        'title:"hash join"~1': {0, 1},
        'title:"hash join"~2': {0, 1, 2},
        'title:"hash join"~9': {0, 1, 2},  # never out-of-order
        '"hash join"~2': {0, 1, 2},        # default (copy_to) field
        # slop can't straddle the title|kw COPY_GAP: 'join x' only via gap
        '"join x"~5': set(),
    }
    for q, exp in want.items():
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(fidx, q, k=10).collect()]
        b = srv.search(q, k=10)
        c = [
            (r["doc_id"], r["score"])
            for r in FL.bm25_topk_fielded_sharded(sidx, q, k=10).collect()
        ]
        assert {d for d, _ in a} == exp, q
        assert [d for d, _ in a] == [d for d, _ in b] == [d for d, _ in c], q
        for (_, sa), (_, sb), (_, sc) in zip(a, b, c):
            assert abs(sa - sb) < 1e-9 and abs(sa - sc) < 1e-9, q


def test_fielded_unordered_slop_four_tiers(spark, tmp_path):
    """Flag-gated out-of-order NEAR on the fielded surface: DF tier,
    Spark sharded tier, in-memory serving, and the Spark-free snapshot
    replica all agree (docs AND scores) with the unordered window
    semantics; COPY_GAP still blocks cross-source windows; the default
    stays ordered-only."""
    from limetrans_spark.plans import lifecycle as lc

    df = spark.createDataFrame(
        [
            (0, "hash join strategies", "x"),
            (1, "hash fast join", "y"),      # ordered gap 1
            (2, "hash one two join", "z"),   # ordered gap 2
            (3, "join before hash", "w"),    # reversal, span 3
            (4, "join hash", "v"),           # reversal, span 2
        ],
        "doc_id long, title string, kw string",
    )
    fields = {"title": "title", "kw": "kw"}
    copy_to = {"title": ["all"], "kw": ["all"]}
    fidx = FL.build_fielded_index(df, fields=fields, copy_to=copy_to)
    sidx = FL.build_fielded_sharded(df, fields=fields, copy_to=copy_to, shard_size=3)
    srv = FL.LocalFieldedSearcher.from_index(fidx)
    root = str(tmp_path / "uoroot")
    lc.save_fielded(sidx, root, "f", "g1")
    repl = FL.LocalFieldedSharded.from_snapshot(root)

    want = {
        'title:"hash join"~1': {0, 1},
        'title:"hash join"~2': {0, 1, 2, 4},
        'title:"hash join"~3': {0, 1, 2, 3, 4},
        '"hash join"~2': {0, 1, 2, 4},   # default (copy_to) field
        '"join x"~5': set(),             # COPY_GAP blocks, ordered or not
    }
    for q, exp in want.items():
        pq = FL.parse_fielded_query(q, "all", fidx.analyzers, unordered_slop=True)
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(fidx, pq, k=10).collect()]
        b = srv.search(q, k=10, unordered_slop=True)
        c = [
            (r["doc_id"], r["score"])
            for r in FL.bm25_topk_fielded_sharded(sidx, pq, k=10).collect()
        ]
        d = repl.search(q, k=10, unordered_slop=True)
        assert {x for x, _ in a} == exp, q
        assert [x for x, _ in a] == [x for x, _ in b] == [x for x, _ in c] == [x for x, _ in d], q
        for (_, sa), (_, sb), (_, sc), (_, sd) in zip(a, b, c, d):
            assert abs(sa - sb) < 1e-9 and abs(sa - sc) < 1e-9 and abs(sa - sd) < 1e-9, q
    # default remains the documented ordered-only deviation
    ordered = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded(fidx, 'title:"hash join"~9', k=10).collect()
    }
    assert ordered == {0, 1, 2}
    # repeated terms reject the flag on the fielded parser too
    with pytest.raises(ValueError, match="repeated"):
        FL.parse_fielded_query('title:"hash join hash"~2', "all", fidx.analyzers,
                               unordered_slop=True)


def test_local_fielded_sharded_from_snapshot(spark, tmp_path):
    """Spark-free fielded replica: save_fielded → LocalFieldedSharded
    .from_snapshot (pure pyarrow) answers rank-identically to the
    DataFrame and sharded Spark tiers, incl. per-field analyzers,
    prefix/fuzzy expansion scoring, and (sloppy) positional phrases."""
    from limetrans_spark.plans import lifecycle as lc

    rows = [
        (i, f"merge{'' if i % 2 else 'd'} queries w{i} fast", f"k{i % 3} exact")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string, kw string")
    fields = {"body": ("body", "simple_stem"), "kw": ("kw", "simple")}
    fidx = FL.build_fielded_index(df, fields=fields, copy_to={"kw": ["all"]})
    sidx = FL.build_fielded_sharded(df, fields=fields, copy_to={"kw": ["all"]}, shard_size=5)
    root = str(tmp_path / "froot")
    lc.save_fielded(sidx, root, "f", "g1")

    repl = FL.LocalFieldedSharded.from_snapshot(root)
    assert repl.analyzers["body"] == "simple_stem"
    for q in [
        "body:query",
        "body:merge kw:exact",
        "kw:k1 | kw:k2",
        "body:quer*",
        "body:mergd~1",
        'body:"queries w2"',
        'body:"queries fast"~1',
        "exact",
        "kw:k1 -kw:k2",
        "typo:x | kw:k0",
    ]:
        a = [(r["doc_id"], r["score"]) for r in FL.bm25_topk_fielded(fidx, q, k=20).collect()]
        b = [
            (r["doc_id"], r["score"])
            for r in FL.bm25_topk_fielded_sharded(sidx, q, k=20).collect()
        ]
        c = repl.search(q, k=20)
        assert [d for d, _ in a] == [d for d, _ in b] == [d for d, _ in c], q
        for (_, sa), (_, sb), (_, sc) in zip(a, b, c):
            assert abs(sa - sb) < 1e-9 and abs(sa - sc) < 1e-9, q


def test_segmented_fielded_equals_rebuild(spark, tmp_path):
    """Fielded base tree + per-field delta segments must answer
    BIT-identically to a fielded rebuild over the final corpus state
    (per-field merged statistics, shared doc-level tombstones)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = (
        synth_corpus(spark, 160, partitions=4)
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
            - 1,
        )
        .withColumn(
            "title", F.array_join(F.slice(F.split(F.col("content"), " "), 1, 6), " ")
        )
        .persist()
    )
    base_corpus = corpus.where(F.col("doc_id") < 150).persist()
    FIELDS = {"title": ("title", "simple"), "body": ("content", "simple_stem")}
    COPY = {"title": ["all"]}
    base_root, delta_root = str(tmp_path / "base"), str(tmp_path / "delta")
    lc.save_fielded(
        FL.build_fielded_sharded(base_corpus, FIELDS, copy_to=COPY, shard_size=32),
        base_root, "x", "g1",
    )

    updated = (
        base_corpus.where(F.col("doc_id") % 8 == 2)
        .withColumn("title", F.lit("segtitle fresh"))
        .withColumn(
            "content",
            F.concat(F.lit("segbody merged "), (F.col("doc_id") % 5).cast("string")),
        )
    )
    new = corpus.where(F.col("doc_id") >= 150)
    delta_docs = updated.unionByName(new).persist()
    lc.publish_fielded_delta_segment(
        spark, base_root, delta_docs, delta_root, "x", "d1",
        fields=FIELDS, copy_to=COPY,
    )
    seg = FL.SegmentedFielded.from_snapshots(base_root, delta_root)

    final = base_corpus.where(F.col("doc_id") % 8 != 2).unionByName(delta_docs)
    re_root = str(tmp_path / "re")
    lc.save_fielded(
        FL.build_fielded_sharded(final, FIELDS, copy_to=COPY, shard_size=32),
        re_root, "x", "g2",
    )
    full = FL.LocalFieldedSharded.from_snapshot(re_root)

    for q in ["title:segtitle", "body:merged", "all:tokenize | all:score",
              'body:"applicable law"', "title:tokenize -body:license",
              "title:seg*"]:
        a = [(d, round(s, 9)) for d, s in full.search(q, k=15)]
        b = [(d, round(s, 9)) for d, s in seg.search(q, k=15)]
        assert a == b, (q, a[:3], b[:3])


def test_fielded_segment_stack_equals_rebuild(spark, tmp_path):
    """Fielded base tree + TWO stacked per-field delta trees opened via
    ``SegmentedFielded.from_chain`` answer bit-identically to a fielded
    rebuild (per-field merged stats chain, shared tombstones union)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = (
        synth_corpus(spark, 130, partitions=4)
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
            - 1,
        )
        .withColumn(
            "title", F.array_join(F.slice(F.split(F.col("content"), " "), 1, 6), " ")
        )
        .persist()
    )
    base = corpus.where(F.col("doc_id") < 110).persist()
    FIELDS = {"title": ("title", "simple"), "body": ("content", "simple_stem")}
    COPY = {"title": ["all"]}
    roots = [str(tmp_path / n) for n in ("base", "d1", "d2", "re")]
    lc.save_fielded(
        FL.build_fielded_sharded(base, FIELDS, copy_to=COPY, shard_size=32),
        roots[0], "x", "g1",
    )

    u1 = base.where(F.col("doc_id") % 6 == 2).withColumn(
        "title", F.lit("stackone fresh")
    )
    n1 = corpus.where((F.col("doc_id") >= 110) & (F.col("doc_id") < 120))
    lc.publish_fielded_delta_segment(
        spark, roots[0], u1.unionByName(n1), roots[1], "x", "s1",
        fields=FIELDS, copy_to=COPY,
    )

    u2 = base.where(F.col("doc_id") % 12 == 2).withColumn(
        "content", F.lit("stacktwo merged body")
    ).unionByName(
        corpus.where(F.col("doc_id") == 113).withColumn(
            "title", F.lit("stacktwo newupd")
        )
    )
    n2 = corpus.where(F.col("doc_id") >= 120)
    lc.publish_fielded_delta_segment(
        spark, roots[1], u2.unionByName(n2), roots[2], "x", "s2",
        fields=FIELDS, copy_to=COPY,
        deleted_ids=spark.createDataFrame([(7,), (111,)], "doc_id long"),
    )
    seg = FL.SegmentedFielded.from_chain(roots[2])
    assert len(seg.searchers) == 3

    final = (
        base.where(
            (F.col("doc_id") % 6 != 2) & ~F.col("doc_id").isin(7)
        )
        .unionByName(u1.where((F.col("doc_id") % 12 != 2)))
        .unionByName(n1.where(~F.col("doc_id").isin(111, 113)))
        .unionByName(u2)
        .unionByName(n2)
    )
    lc.save_fielded(
        FL.build_fielded_sharded(final, FIELDS, copy_to=COPY, shard_size=32),
        roots[3], "x", "g2",
    )
    full = FL.LocalFieldedSharded.from_snapshot(roots[3])

    for q in ["title:stackone", "body:stacktwo", "title:stacktwo",
              "all:tokenize | all:score", 'body:"applicable law"',
              "title:fresh -body:merged", "title:stack*"]:
        a = [(d, round(s, 9)) for d, s in full.search(q, k=15)]
        b = [(d, round(s, 9)) for d, s in seg.search(q, k=15)]
        assert a == b, (q, a[:3], b[:3])


def test_compact_fielded_segments_equals_stack(spark, tmp_path):
    """Folding a fielded 2-delta stack with ``compact_fielded_segments``
    (corpus rows reconstructed from the per-field docstores) publishes
    a fresh save_fielded tree bit-identical to serving the stack."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = (
        synth_corpus(spark, 90, partitions=2)
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
            - 1,
        )
        .withColumn(
            "title", F.array_join(F.slice(F.split(F.col("content"), " "), 1, 5), " ")
        )
        .persist()
    )
    FIELDS = {"title": ("title", "simple"), "body": ("content", "simple_stem")}
    COPY = {"title": ["all"]}
    roots = [str(tmp_path / n) for n in ("base", "d1", "d2", "cc")]
    lc.save_fielded(
        FL.build_fielded_sharded(corpus, FIELDS, copy_to=COPY, shard_size=32),
        roots[0], "x", "g1",
    )
    lc.publish_fielded_delta_segment(
        spark, roots[0],
        corpus.where(F.col("doc_id") % 7 == 3).withColumn(
            "title", F.lit("fcompact one")
        ),
        roots[1], "x", "s1", fields=FIELDS, copy_to=COPY,
    )
    lc.publish_fielded_delta_segment(
        spark, roots[1],
        corpus.where(F.col("doc_id") % 14 == 3).withColumn(
            "content", F.lit("fcompact two body")
        ),
        roots[2], "x", "s2", fields=FIELDS, copy_to=COPY,
        deleted_ids=spark.createDataFrame([(6,)], "doc_id long"),
    )

    lc.compact_fielded_segments(
        spark, roots[2], roots[3], "x", "g2", fields=FIELDS, copy_to=COPY
    )
    flat = FL.LocalFieldedSharded.from_snapshot(roots[3])
    stack = FL.SegmentedFielded.from_chain(roots[2])
    for q in ["title:fcompact", "body:fcompact", "all:tokenize | all:score",
              'body:"applicable law"', "title:fcomp*", "body:two -title:one"]:
        a = [(d, round(s, 9)) for d, s in flat.search(q, k=15)]
        b = [(d, round(s, 9)) for d, s in stack.search(q, k=15)]
        assert a == b, (q, a[:3], b[:3])
    assert all(d != 6 for d, _ in flat.search("all:tokenize", k=100))


def test_check_fielded_segments(spark, tmp_path):
    """``check_fielded_segments`` validates every field's stack against
    its merged statistics plus the equal-depth / shared-tombstone
    invariants; a field whose chain link is severed must raise."""
    import json as _json
    import os as _os

    from pyspark.sql import Window

    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = (
        synth_corpus(spark, 80, partitions=2)
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
            - 1,
        )
        .withColumn(
            "title", F.array_join(F.slice(F.split(F.col("content"), " "), 1, 5), " ")
        )
        .persist()
    )
    FIELDS = {"title": ("title", "simple"), "body": ("content", "simple")}
    COPY = {"title": ["all"]}
    base_root = str(tmp_path / "base")
    lc.save_fielded(
        FL.build_fielded_sharded(corpus, FIELDS, copy_to=COPY, shard_size=32),
        base_root, "x", "g1",
    )
    d1_root = str(tmp_path / "d1")
    lc.publish_fielded_delta_segment(
        spark, base_root,
        corpus.where(F.col("doc_id") % 9 == 4).withColumn(
            "title", F.lit("fchk fresh")
        ),
        d1_root, "x", "s1",
        fields=FIELDS, copy_to=COPY,
        deleted_ids=spark.createDataFrame([(3,)], "doc_id long"),
    )

    report = lc.check_fielded_segments(spark, d1_root)
    assert report["ok"] and report["segments"] == 2
    assert set(report["fields"]) == {"title", "body", "all"}
    assert all(r["ok"] for r in report["fields"].values())
    assert report["tombstone_mismatches"] == []

    # fielded getDocument: newest-first walk reconstructs {field: text}
    seg = FL.SegmentedFielded.from_chain(d1_root)
    assert seg.get_document(3) is None  # deleted
    upd = seg.get_document(4)  # re-published in the delta
    orig4 = corpus.where(F.col("doc_id") == 4).collect()[0]
    # copy_to target "all" is derived (no source text) -> omitted
    assert upd == {"title": "fchk fresh", "body": orig4["content"]}
    keep = seg.get_document(5)  # untouched: served from the base tree
    orig5 = corpus.where(F.col("doc_id") == 5).collect()[0]
    assert keep == {"title": orig5["title"], "body": orig5["content"]}
    assert seg.get_document(10**9) is None

    # sever one field's chain link -> unequal stack depths must raise
    snap_name = lc.current_snapshot(_os.path.join(d1_root, "fields", "body"))
    mpath = _os.path.join(
        d1_root, "fields", "body", "snapshots", snap_name, "manifest.json"
    )
    with open(mpath) as f:
        mani = _json.load(f)
    del mani["metrics"]["segment_of"]
    with open(mpath, "w") as f:
        _json.dump(mani, f)
    with pytest.raises(ValueError, match="depths differ"):
        lc.check_fielded_segments(spark, d1_root)
