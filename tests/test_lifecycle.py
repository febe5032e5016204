"""Lifecycle: snapshot publish/load round-trip, atomic alias swap,
retention of 2 old generations, checkpointed resume with lineage
(north_rule: resumable from per-partition checkpoints)."""

import json
import os
import shutil

import pytest

from limetrans_spark.operators import query as Q
from limetrans_spark.operators.build import build_index
from limetrans_spark.plans import lifecycle as lc
from limetrans_spark.sources.corpus import synth_corpus

N_DOCS = 100


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "index_root")


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_corpus(spark, N_DOCS, max_tokens=200, partitions=4).persist()


def test_publish_load_query_identity(spark, corpus, root):
    rep = lc.build_and_publish(
        corpus, root, "code", "g1", shard_size=32, n_buckets=4, wave_size=2
    )
    assert lc.current_snapshot(root) == "code-g1"
    loaded = lc.load_index(spark, root)
    a = Q.bm25_topk_df(rep.index, "tokenize score", k=10).collect()
    b = Q.bm25_topk_df(loaded, "tokenize score", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    c = Q.bm25_topk_sharded(loaded, "tokenize | score", k=10).collect()
    d = Q.bm25_topk_sharded(rep.index, "tokenize | score", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in c] == [
        (r["doc_id"], r["score"]) for r in d
    ]
    # manifest carries stats + lineage metrics
    with open(os.path.join(rep.snapshot, "manifest.json")) as f:
        m = json.load(f)
    assert m["n_docs"] == N_DOCS
    assert m["metrics"]["n_postings"] > 0
    assert len(m["metrics"]["lineage"]) == 4


def test_resume_skips_done_buckets(spark, corpus, root):
    docs = lc.assign_doc_ids(corpus)
    ckpt = os.path.join(root, "checkpoints", "t")
    # wave 1 only: simulate an interrupted build by restricting to 2 buckets
    p1, m1 = lc.checkpointed_postings(
        docs, ckpt, n_buckets=4, wave_size=2, analyzer="code"
    )
    assert m1["resumed_buckets"] == 0 and m1["built_buckets"] == 4
    full = {(r["term"], r["doc_id"]): r["tf"] for r in p1.collect()}

    # delete two markers → those buckets must rebuild, others resume
    os.remove(os.path.join(ckpt, "_bucket_1.json"))
    os.remove(os.path.join(ckpt, "_bucket_3.json"))
    p2, m2 = lc.checkpointed_postings(
        docs, ckpt, n_buckets=4, wave_size=2, analyzer="code"
    )
    assert m2["resumed_buckets"] == 2 and m2["built_buckets"] == 2
    again = {(r["term"], r["doc_id"]): r["tf"] for r in p2.collect()}
    assert again == full
    # lineage fingerprints identical across resume (deterministic build)
    fp1 = {m["bucket"]: m["fingerprint"] for m in m1["lineage"]}
    fp2 = {m["bucket"]: m["fingerprint"] for m in m2["lineage"]}
    assert fp1 == fp2


def test_retention_and_alias(spark, corpus, root):
    idx = build_index(corpus, shard_size=64)
    for g in ["g1", "g2", "g3", "g4"]:
        lc.save_index(idx, root, "code", g, retain=2)
    # current = g4; retain 2 old generations → g1 deleted, g2/g3 kept
    assert lc.current_snapshot(root) == "code-g4"
    assert lc.list_snapshots(root) == ["code-g2", "code-g3", "code-g4"]


def test_no_publish_on_empty_build(spark, root):
    empty = spark.createDataFrame([], "repo string, path string, commit string, lang string, content string")
    idx = build_index(empty, shard_size=64)
    lc.save_index(idx, root, "code", "g0", retain=2)
    # zero-doc build must NOT become the alias target (switchIndex guard)
    assert lc.current_snapshot(root) is None


def test_load_without_snapshot_raises(spark, root):
    with pytest.raises(FileNotFoundError):
        lc.load_index(spark, root)


def test_snapshot_scan_pushdown(spark, corpus, root):
    """Regression guard: term predicates must reach the parquet scan of a
    published snapshot (PushedFilters), so term lookups prune row groups
    instead of decoding the whole index."""
    from pyspark.sql import functions as F

    lc.build_and_publish(corpus, root, "code", "gp", shard_size=32, n_buckets=4)
    idx = lc.load_index(spark, root)
    plan = idx.shards.filter(F.col("term").isin(["tokenize", "score"]))._jdf.queryExecution().toString()
    assert "PushedFilters" in plan
    assert "In(term" in plan
    plan2 = idx.postings.filter(F.col("term") == "tokenize")._jdf.queryExecution().toString()
    assert "EqualTo(term,tokenize)" in plan2
    # prefix expansions push StringStartsWith into the (term-sorted)
    # dictionary parquet → row-group pruning instead of a full vocab scan
    plan3 = idx.terms.filter(F.col("term").startswith("tok"))._jdf.queryExecution().toString()
    assert "StringStartsWith(term,tok)" in plan3
    # fuzzy expansion's length band hits the STORED tlen column — a
    # pushable range predicate on the dictionary scan, not a computed
    # length() over every row
    assert "tlen" in idx.terms.columns
    from limetrans_spark.operators.query import _expand_fuzzy

    plan4 = (
        idx.terms.filter(F.col("tlen").between(6, 10))._jdf.queryExecution().toString()
    )
    assert "GreaterThanOrEqual(tlen,6)" in plan4 and "LessThanOrEqual(tlen,10)" in plan4
    # and the expansion path still answers correctly through the snapshot
    assert "tokenize" in _expand_fuzzy(idx, "tokenizr", 1)


def test_retention_numeric_seq_and_base_scoping(tmp_path):
    """name-YYYYMMDD-10 is NEWER than name-YYYYMMDD-2 (numeric seq, not
    lexicographic), and retention pools are per base name."""
    root = str(tmp_path / "idxroot")
    snapdir = os.path.join(root, "snapshots")
    gens = [f"code-20260816-{i}" for i in (1, 2, 3, 9, 10, 11)]
    other = ["other-20260101", "other-20260102"]
    for s in gens + other:
        os.makedirs(os.path.join(snapdir, s))
    lc.switch_alias(root, "code-20260816-11")
    doomed = lc.retain_snapshots(root, retain=2)
    # current (seq 11) kept; newest 2 old = seq 9, 10; doomed = 1,2,3
    assert sorted(doomed) == [f"code-20260816-{i}" for i in (1, 2, 3)]
    left = set(os.listdir(snapdir))
    assert {"code-20260816-9", "code-20260816-10", "code-20260816-11"} <= left
    # the 'other' index's two generations are a separate pool — untouched
    assert set(other) <= left


def test_update_mode_requires_existing_index(spark, corpus, tmp_path):
    """checkIndex parity (ElasticsearchClient.java:110-112, 204-209):
    update mode fails fast when no index exists, and otherwise lands in
    the CURRENT generation without minting a new one."""
    root = str(tmp_path / "uroot")
    with pytest.raises(FileNotFoundError):
        lc.build_and_publish(corpus, root, "code", "ignored", update=True)
    rep1 = lc.build_and_publish(corpus, root, "code", "g1")
    assert lc.current_snapshot(root) == "code-g1"
    rep2 = lc.build_and_publish(corpus, root, "code", "zzz-ignored", update=True)
    assert lc.current_snapshot(root) == "code-g1"  # same generation, no new snapshot
    assert lc.list_snapshots(root) == ["code-g1"]
    assert rep2.index.n_docs == rep1.index.n_docs


def test_compact_segments_equals_rebuild(spark, tmp_path):
    """Folding a base + 2-delta segment stack with ``compact_segments``
    must publish a fresh positional base whose answers (incl. phrases)
    are bit-identical to serving the stack, with no segment_of link."""
    import json as _json
    import os as _os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.build import build_index
    from limetrans_spark.operators.serve import LocalSearcher, SegmentedSearcher
    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, 100, partitions=2).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    b = lc.save_index(
        build_index(corpus, shard_size=32), str(tmp_path / "base"), "c", "g1"
    )
    d1 = lc.publish_delta_segment(
        spark, b,
        corpus.where(F.col("doc_id") % 9 == 2).withColumn(
            "content", F.lit("compactme alpha beta")
        ),
        str(tmp_path / "d1"), "c", "s1",
    )
    d2 = lc.publish_delta_segment(
        spark, d1,
        corpus.where(F.col("doc_id") % 18 == 2).withColumn(
            "content", F.lit("compactme gamma delta")
        ),
        str(tmp_path / "d2"), "c", "s2",
        deleted_ids=spark.createDataFrame([(4,)], "doc_id long"),
    )

    c_snap = lc.compact_segments(spark, d2, str(tmp_path / "compacted"), "c", "g2")
    with open(_os.path.join(c_snap, "manifest.json")) as f:
        assert "segment_of" not in (_json.load(f).get("metrics") or {})

    stack = SegmentedSearcher.from_chain(d2)
    flat = LocalSearcher.from_snapshot(c_snap)
    for q in ["compactme", "alpha -gamma", '"compactme gamma"',
              "tokenize | score", "compact*", '"applicable law"']:
        a = [(d, round(s, 9)) for d, s in stack.search(q, k=15)]
        b2 = [(d, round(s, 9)) for d, s in flat.search(q, k=15)]
        assert a == b2, (q, a[:3], b2[:3])
    assert flat.search("compactme", k=50) and all(
        d != 4 for d, _ in flat.search("tokenize", k=100)
    )


def test_check_segments_green_then_detects_corruption(spark, tmp_path):
    """``check_segments`` is the stack-level checkIndex: recomputing the
    final state from the segments' own postings must agree with the
    newest segment's exactly-merged statistics; deleting a segment's
    tombstone list (so a superseded doc is live twice) must raise."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    corpus = synth_corpus(spark, 80, partitions=2).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    base = lc.save_index(
        build_index(corpus, shard_size=32), str(tmp_path / "base"), "c", "g1"
    )
    with pytest.raises(ValueError, match="segment_of"):
        lc.check_segments(spark, base)  # stack checker needs a stack

    # plain snapshot: check_index verifies terms vs postings + manifest
    rep0 = lc.check_index(spark, base)
    assert rep0["ok"] and rep0["segments"] == 1
    assert rep0["avgdl"] == rep0["avgdl_expected"]  # bit-equal, ÷-once

    # deep: every compressed run in the serving artifact decodes clean
    deep0 = lc.check_index(spark, base, deep=True)
    assert deep0["deep"]["violations"] == 0 and deep0["deep"]["postings"] > 0

    # blob-level corruption (truncate one doc_blob) is INVISIBLE to the
    # stats checks (n/sum_tf unchanged) — only the deep decode sees it
    import pyarrow as pa
    import pyarrow.parquet as pq

    sdir = os.path.join(base, "shards")
    tbl = pa.concat_tables(
        pq.read_table(os.path.join(sdir, f)) for f in sorted(os.listdir(sdir))
        if f.endswith(".parquet")
    )
    blobs = tbl.column("doc_blob").to_pylist()
    victim = max(range(len(blobs)), key=lambda i: len(blobs[i]))
    blobs[victim] = blobs[victim][:-1]
    tampered = tbl.set_column(
        tbl.schema.get_field_index("doc_blob"), "doc_blob",
        pa.array(blobs, type=pa.binary()),
    )
    shutil.rmtree(sdir)
    os.makedirs(sdir)
    pq.write_table(tampered, os.path.join(sdir, "part-0.parquet"))
    assert lc.check_index(spark, base)["ok"]  # stats-only check passes
    with pytest.raises(ValueError, match="snapshot check failed"):
        lc.check_index(spark, base, deep=True)
    pq.write_table(tbl, os.path.join(sdir, "part-0.parquet"))  # restore

    # a LOST docstore row leaves every statistic derived from postings
    # intact — the orphan-postings counter is what catches it
    ddir = os.path.join(base, "docstore")
    dtbl = pa.concat_tables(
        pq.read_table(os.path.join(ddir, f)) for f in sorted(os.listdir(ddir))
        if f.endswith(".parquet")
    )
    import pyarrow.compute as pc

    victim_doc = dtbl.column("doc_id")[0].as_py()
    shutil.rmtree(ddir)
    os.makedirs(ddir)
    pq.write_table(
        dtbl.filter(pc.not_equal(dtbl.column("doc_id"), victim_doc)),
        os.path.join(ddir, "part-0.parquet"),
    )
    with pytest.raises(ValueError, match="'orphan_posting_docs': 1"):
        lc.check_index(spark, base)
    pq.write_table(dtbl, os.path.join(ddir, "part-0.parquet"))  # restore

    # tamper the manifest doc count -> check_index must refuse
    mpath = os.path.join(base, "manifest.json")
    with open(mpath) as f:
        mani = json.load(f)
    mani["n_docs"] += 1
    with open(mpath, "w") as f:
        json.dump(mani, f)
    with pytest.raises(ValueError, match="snapshot check failed"):
        lc.check_index(spark, base)
    mani["n_docs"] -= 1
    with open(mpath, "w") as f:
        json.dump(mani, f)

    d1 = lc.publish_delta_segment(
        spark, base,
        corpus.where(F.col("doc_id") % 7 == 3).withColumn(
            "content", F.lit("checkme alpha beta")
        ),
        str(tmp_path / "d1"), "c", "s1",
    )
    d2 = lc.publish_delta_segment(
        spark, d1,
        corpus.where(F.col("doc_id") % 14 == 3).withColumn(
            "content", F.lit("checkme gamma")
        ),
        str(tmp_path / "d2"), "c", "s2",
        deleted_ids=spark.createDataFrame([(5,)], "doc_id long"),
    )

    report = lc.check_segments(spark, d2)
    assert report["ok"] and report["segments"] == 3
    assert report["term_stat_mismatches"] == 0
    assert report["duplicate_live_docs"] == 0
    assert report["n_docs"] == report["n_docs_expected"]

    deep_stack = lc.check_segments(spark, d2, deep=True)
    assert deep_stack["deep"]["violations"] == 0
    assert len(deep_stack["deep"]["per_segment"]) == 3

    # corrupt the stack: drop d2's tombstones — the d1/base versions of
    # the updated docs (and deleted doc 5) become live again
    shutil.rmtree(os.path.join(d2, "tombstones"))
    with pytest.raises(ValueError, match="segment stack check failed"):
        lc.check_segments(spark, d2)


@pytest.mark.parametrize("seed", [7, 23])
def test_segment_stack_random_sequences_equal_rebuild(spark, tmp_path, seed):
    """Randomized stack-equivalence: a seeded random sequence of update/
    append/delete batches published as chained delta segments must serve
    bit-identically to one rebuild over the final state, for every query
    shape, and pass the deep checker."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.serve import LocalSearcher, SegmentedSearcher

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]

    def text():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))

    state = {i: text() for i in range(60)}
    corpus = spark.createDataFrame(
        [(i, t) for i, t in state.items()], "doc_id long, content string"
    )
    snap = lc.save_index(
        build_index(corpus, text_col="content", shard_size=16),
        str(tmp_path / "base"), "r", "g1",
    )
    next_id = 60
    for rnd in range(3):
        upd_ids = rng.sample(sorted(state), k=rng.randint(1, 8))
        new_ids = list(range(next_id, next_id + rng.randint(0, 3)))
        next_id += len(new_ids)
        batch = {i: text() for i in upd_ids + new_ids}
        live = [i for i in sorted(state) if i not in batch]
        del_ids = rng.sample(live, k=rng.randint(0, 2))
        state.update(batch)
        for i in del_ids:
            del state[i]
        snap = lc.publish_delta_segment(
            spark, snap,
            spark.createDataFrame(
                list(batch.items()), "doc_id long, content string"
            ),
            str(tmp_path / f"d{rnd}"), "r", f"s{rnd}",
            deleted_ids=(
                spark.createDataFrame([(i,) for i in del_ids], "doc_id long")
                if del_ids else None
            ),
        )

    rebuilt = lc.save_index(
        build_index(
            spark.createDataFrame(
                list(state.items()), "doc_id long, content string"
            ),
            text_col="content", shard_size=16,
        ),
        str(tmp_path / "re"), "r", "g2",
    )
    stack = SegmentedSearcher.from_chain(snap)
    flat = LocalSearcher.from_snapshot(rebuilt)
    queries = [
        "w0 w1", "w2 | w3", "w4 -w5", '"w6 w7"', '"w1 w2"~2', "w*", "w1~1",
        rng.choice(vocab),
    ]
    for q in queries:
        a = [(d, round(s, 9)) for d, s in flat.search(q, k=200)]
        b = [(d, round(s, 9)) for d, s in stack.search(q, k=200)]
        assert a == b, (seed, q, a[:3], b[:3])
    assert lc.check_segments(spark, snap, deep=True)["ok"]
