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
    # positive clause expanding to zero vocab terms → empty, not an error
    # (match the DF tier; the raise is reserved for match_all shapes)
    assert searcher.search("zzznope*", k=5) == []
    assert searcher.search("zzznope* -tokenize", k=5) == []
    with pytest.raises(ValueError):
        searcher.search("-tokenize", k=5)


def test_analyzer_twin_selected_from_index_label(spark):
    """A stemmed or stop index queried with a STRING query analyzes the
    query with the matching twin on every flat path (DF, sharded,
    serving) — the CLI search path depends on this (a 'simple_stem'
    snapshot must match 'queries' ↔ 'query')."""
    from limetrans_spark.operators import query as Q
    from limetrans_spark.operators.build import build_index

    df = spark.createDataFrame(
        [(0, "merged queries fast"), (1, "sort scan"), (2, "die Katze und der Hund")],
        "doc_id long, content string",
    )
    sidx = build_index(df, analyzer="simple_stem", shard_size=8)
    for got in [
        {r["doc_id"] for r in Q.matching_docs_df(sidx, "query").collect()},
        {r["doc_id"] for r in Q.bm25_topk_df(sidx, "query", k=10).collect()},
        {r["doc_id"] for r in Q.bm25_topk_sharded(sidx, "query", k=10).collect()},
        {d for d, _ in LocalSearcher.from_index(sidx).search("query", k=10)},
    ]:
        assert got == {0}, got

    pidx = build_index(df, analyzer="simple_stop", shard_size=8)
    # stopwords dropped from the query on all paths; survivors match
    for got in [
        {r["doc_id"] for r in Q.matching_docs_df(pidx, "die katze").collect()},
        {r["doc_id"] for r in Q.bm25_topk_sharded(pidx, "die katze", k=10).collect()},
        {d for d, _ in LocalSearcher.from_index(pidx).search("die katze", k=10)},
    ]:
        assert got == {2}, got


def test_from_snapshot_sparkless_replica(spark, tmp_path):
    """A published snapshot opens WITHOUT Spark (pure pyarrow) and
    answers identically to the in-memory searcher; a shard-subset
    replica serves its slice with GLOBAL statistics (scores equal the
    full searcher's on its docs, so cross-replica top-k merges)."""
    from limetrans_spark.operators.build import build_index
    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    idx = build_index(synth_corpus(spark, 120, partitions=4), shard_size=32)
    root = str(tmp_path / "idx")
    snap = lc.save_index(idx, root, "code", "g1")

    full_mem = LocalSearcher.from_index(idx)
    full_snap = LocalSearcher.from_snapshot(snap)
    assert full_snap.analyzer == "code"
    for q in ["tokenize score", "parse json | license", '"applicable law"', "varint*"]:
        a = [(d, round(s, 9)) for d, s in full_mem.search(q, k=15)]
        b = [(d, round(s, 9)) for d, s in full_snap.search(q, k=15)]
        assert a == b, q

    # replica for shards {0, 2}: same scores, restricted doc space
    replica = LocalSearcher.from_snapshot(snap, shard_subset=[0, 2])
    full = dict(full_snap.search("tokenize score", k=1000))
    got = replica.search("tokenize score", k=1000)
    assert got and all(d // 32 in (0, 2) for d, _ in got)
    for d, s in got:
        assert abs(s - full[d]) < 1e-12


def test_flat_and_vectorized_matches_taat(searcher):
    """The flat AND fast path (dense scatter-add / sparse intersection /
    single-term) must stay BIT-identical to the structured branch —
    an independent implementation (group set algebra + weight gather);
    appending a no-op negation forces that branch.  Primary correctness
    oracle remains rank identity vs the Spark tiers
    (test_serving_matches_spark_paths)."""
    for q in ["tokenize score", "tokenize", "parse json license",
              "varint tokenize"]:
        ref = searcher.search(q + " -zzzznonexistentterm", k=50)
        got = searcher.search(q, k=50)
        assert got == ref, q
    assert searcher.search("zzzznonexistentterm tokenize", k=5) == []


def test_topk_vec_tie_break_exact():
    """argpartition pre-selection keeps the exact (score desc, doc asc)
    order even with heavy score ties at the k-th boundary."""
    import numpy as np

    from limetrans_spark.operators.serve import _topk_vec

    rng = np.random.default_rng(7)
    docs = np.arange(5000, dtype=np.int64)
    score = rng.choice(np.linspace(0.0, 1.0, 40), size=5000)
    got = _topk_vec(docs, score, 25)
    order = np.lexsort((docs, -score))[:25]
    assert got == [(int(docs[i]), float(score[i])) for i in order]


def test_replica_fanout_merge_exact(spark, tmp_path):
    """R disjoint shard-slice replicas + merge_topk == the full
    searcher, scores and tie-breaks included — the cross-replica
    serving story (each replica scores with global statistics)."""
    from limetrans_spark.operators.serve import merge_topk
    from limetrans_spark.plans import lifecycle as lc

    idx = build_index(synth_corpus(spark, 160, partitions=4), shard_size=32)
    snap = lc.save_index(idx, str(tmp_path / "idx"), "code", "g1")
    full = LocalSearcher.from_snapshot(snap)
    n_shards = (160 - 1) // 32 + 1
    slices = [
        [s for s in range(n_shards) if s % 3 == r] for r in range(3)
    ]
    replicas = [
        LocalSearcher.from_snapshot(snap, shard_subset=sl) for sl in slices
    ]
    for q in ["tokenize score", "parse | json", '"applicable law"', "varint*"]:
        want = [(d, round(s, 9)) for d, s in full.search(q, k=12)]
        got = [
            (d, round(s, 9))
            for d, s in merge_topk([r.search(q, k=12) for r in replicas], 12)
        ]
        assert got == want, q
    assert merge_topk([[], []], 5) == []


def test_serving_cache_budget_bounded(spark, tmp_path):
    """The decoded/global posting caches are byte-accounted with FIFO
    eviction: a tiny budget keeps steady-state memory bounded while
    results stay identical (evicted entries rebuild transparently)."""
    from limetrans_spark.plans import lifecycle as lc

    idx = build_index(synth_corpus(spark, 150, partitions=4), shard_size=32)
    snap = lc.save_index(idx, str(tmp_path / "idx"), "code", "g1")
    tiny = LocalSearcher.from_snapshot(snap, cache_budget_bytes=2_000)
    big = LocalSearcher.from_snapshot(snap)
    queries = ["tokenize score", "parse | json", '"applicable law"',
               "varint*", "tokenize", "license parse"]
    for _ in range(2):  # pass 2 exercises rebuild-after-eviction
        for q in queries:
            assert tiny.search(q, k=10) == big.search(q, k=10), q
        assert sum(tiny._cache_sizes.values()) == tiny._cache_bytes
        assert (
            tiny._cache_bytes <= 2_000 or len(tiny._cache_sizes) == 1
        ), tiny._cache_bytes
    assert big._cache_bytes > 2_000  # the budget actually bound something


def test_segmented_serving_equals_rebuild(spark, tmp_path):
    """Base snapshot + delta segment (tombstoned updates, merged global
    stats) must answer BIT-identically to a full rebuild over the final
    corpus state — Lucene-segment update semantics with exact BM25."""
    from pyspark.sql import functions as F

    from limetrans_spark.operators.serve import SegmentedSearcher
    from limetrans_spark.plans import lifecycle as lc

    from pyspark.sql import Window

    corpus = synth_corpus(spark, 192, partitions=4).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    base_corpus = corpus.where(F.col("doc_id") < 180).persist()
    idx1 = build_index(base_corpus, shard_size=32)
    base_snap = lc.save_index(idx1, str(tmp_path / "base"), "code", "g1")

    # delta: 20 docs replaced wholesale + 12 appended
    updated = base_corpus.where(F.col("doc_id") % 9 == 4).withColumn(
        "content",
        F.concat(
            F.lit("segment fresh tokenize "),
            (F.col("doc_id") % 7).cast("string"),
        ),
    )
    new = corpus.where(F.col("doc_id") >= 180)
    delta_docs = updated.unionByName(new).persist()
    # outright deletions, disjoint from the updates
    gone = (F.col("doc_id") % 25 == 3) & (F.col("doc_id") % 9 != 4)
    delta_snap = lc.publish_delta_segment(
        spark, base_snap, delta_docs, str(tmp_path / "delta"), "code", "d1",
        deleted_ids=base_corpus.where(gone).select("doc_id"),
    )
    seg = SegmentedSearcher.from_snapshots(base_snap, delta_snap)

    final = base_corpus.where(
        (F.col("doc_id") % 9 != 4) & ~gone
    ).unionByName(delta_docs)
    full = LocalSearcher.from_index(build_index(final, shard_size=32))

    for q in ["tokenize score", "parse | json", '"applicable law"',
              "varint* -license", "segment fresh", "tokeniz~1",
              "segment -fresh"]:
        a = [(d, round(s, 9)) for d, s in full.search(q, k=15)]
        b = [(d, round(s, 9)) for d, s in seg.search(q, k=15)]
        assert a == b, (q, a[:3], b[:3])
    # a replaced doc's OLD content must be unfindable through the base
    assert all(
        d in {r["doc_id"] for r in delta_docs.select("doc_id").collect()}
        or d % 9 != 4
        for d, _ in seg.search("tokenize", k=200)
    )


def test_segment_stack_equals_rebuild(spark, tmp_path):
    """Base + TWO stacked delta segments (re-updates, a delta-born doc
    updated again, deletions of base AND delta-born docs) opened via
    ``from_chain`` must answer bit-identically to a full rebuild —
    stats chain through merged_terms/merged_sum_dl, never recomputed
    from the base."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.serve import SegmentedSearcher
    from limetrans_spark.plans import lifecycle as lc

    corpus = synth_corpus(spark, 140, partitions=4).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    base = corpus.where(F.col("doc_id") < 120).persist()
    b_snap = lc.save_index(
        build_index(base, shard_size=32), str(tmp_path / "base"), "c", "g1"
    )

    # delta 1: update docs %7==1, append 120..129
    u1 = base.where(F.col("doc_id") % 7 == 1).withColumn(
        "content",
        F.concat(F.lit("deltaone fresh "), (F.col("doc_id") % 4).cast("string")),
    )
    n1 = corpus.where((F.col("doc_id") >= 120) & (F.col("doc_id") < 130))
    d1_snap = lc.publish_delta_segment(
        spark, b_snap, u1.unionByName(n1), str(tmp_path / "d1"), "c", "s1"
    )

    # delta 2: RE-update half the d1 updates, update a d1-born doc,
    # append 130..139, delete base doc 5 and d1-born doc 120
    u2 = (
        base.where(F.col("doc_id") % 14 == 1)
        .withColumn("content", F.lit("deltatwo reupdate"))
        .unionByName(
            corpus.where(F.col("doc_id") == 124).withColumn(
                "content", F.lit("deltatwo newupd")
            )
        )
    )
    n2 = corpus.where(F.col("doc_id") >= 130)
    d2_snap = lc.publish_delta_segment(
        spark, d1_snap, u2.unionByName(n2), str(tmp_path / "d2"), "c", "s2",
        deleted_ids=spark.createDataFrame([(5,), (120,)], "doc_id long"),
    )
    seg = SegmentedSearcher.from_chain(d2_snap)
    assert len(seg.searchers) == 3

    final = (
        base.where((F.col("doc_id") % 7 != 1) & (F.col("doc_id") != 5))
        .unionByName(u1.where(F.col("doc_id") % 14 != 1))
        .unionByName(n1.where(~F.col("doc_id").isin(120, 124)))
        .unionByName(u2)
        .unionByName(n2)
    )
    full = LocalSearcher.from_index(build_index(final, shard_size=32))

    for q in ["deltaone", "deltatwo", "tokenize | score", "license -tokenize",
              '"applicable law"', "token*", "deltaone deltatwo", "fresh",
              "deltaon~1"]:
        a = [(d, round(s, 9)) for d, s in full.search(q, k=20)]
        b = [(d, round(s, 9)) for d, s in seg.search(q, k=20)]
        assert a == b, (q, a[:3], b[:3])
    # merged dictionary is exact for old, re-removed, and fresh terms
    for t in ["deltaone", "deltatwo", "tokenize", "license"]:
        assert seg.delta.term_df.get(t, 0) == full.term_df.get(t, 0), t


def test_serving_get_document(spark, tmp_path):
    """Spark-free point lookup: LocalSearcher.get_document answers from
    the docstore parquet; across a segment stack the newest live
    version wins, superseded/deleted ids answer None."""
    import pytest as _pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.serve import SegmentedSearcher
    from limetrans_spark.plans import lifecycle as lc

    corpus = synth_corpus(spark, 50, partitions=2).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    b = lc.save_index(
        build_index(corpus, shard_size=32), str(tmp_path / "b"), "c", "g1"
    )
    one = LocalSearcher.from_snapshot(b)
    row = one.get_document(3)
    want = corpus.where(F.col("doc_id") == 3).collect()[0]
    assert row is not None and row["content"] == want["content"]
    assert one.get_document(10_000) is None
    with _pytest.raises(ValueError):
        LocalSearcher.from_index(build_index(corpus, shard_size=32)).get_document(3)

    d1 = lc.publish_delta_segment(
        spark, b,
        corpus.where(F.col("doc_id") == 7).withColumn(
            "content", F.lit("getdoc fresh")
        ),
        str(tmp_path / "d1"), "c", "s1",
        deleted_ids=spark.createDataFrame([(9,)], "doc_id long"),
    )
    seg = SegmentedSearcher.from_chain(d1)
    assert seg.get_document(7)["content"] == "getdoc fresh"
    assert seg.get_document(9) is None          # deleted
    assert seg.get_document(3)["content"] == want["content"]  # untouched


def test_snapshot_watcher_follows_alias(spark, tmp_path):
    """SnapshotWatcher: a replica follows the alias as publishes move it
    — auto mode swaps in the new generation on the next call, the swap
    is build-then-replace (never a half-loaded index), and an unchanged
    alias is a no-op refresh."""
    import time as _time

    from limetrans_spark.operators.build import build_index
    from limetrans_spark.operators.serve import SnapshotWatcher
    from limetrans_spark.plans import lifecycle as lc

    root = str(tmp_path / "watchroot")
    g1 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma alpha")], "doc_id long, content string"
    )
    lc.save_index(build_index(g1, shard_size=16), root, "w", "g1")
    w = SnapshotWatcher(root)
    assert w.snapshot == "w-g1"
    assert {d for d, _ in w.search("alpha", k=10)} == {0, 1}
    assert w.refresh() is False  # unchanged alias: no-op

    _time.sleep(0.01)  # ensure a distinct alias mtime
    g2 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha fresh")],
        "doc_id long, content string",
    )
    lc.save_index(build_index(g2, shard_size=16), root, "w", "g2")
    # auto mode: the very next search serves generation 2
    assert {d for d, _ in w.search("alpha", k=10)} == {0, 2}
    assert w.snapshot == "w-g2"
    assert w.get_document(2)["content"] == "alpha fresh"

    # manual mode: stale until refresh() is called
    m = SnapshotWatcher(root, auto=False)
    _time.sleep(0.01)
    g3 = spark.createDataFrame(
        [(5, "alpha only")], "doc_id long, content string"
    )
    lc.save_index(build_index(g3, shard_size=16), root, "w", "g3")
    assert {d for d, _ in m.search("alpha", k=10)} == {0, 2}  # still g2
    assert m.refresh() is True
    assert {d for d, _ in m.search("alpha", k=10)} == {5}
