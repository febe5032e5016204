"""Index-build invariants (SURVEY.md §5 test plan): deterministic IDs,
sha256 invariant, postings/df/dl accounting, shard codec round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from limetrans_spark.operators import codec
from limetrans_spark.operators.build import (
    assign_doc_ids,
    build_index,
    verify_sha256,
)
from limetrans_spark.sources.corpus import synth_corpus, synth_corpus_rows
from tests.oracle import OracleIndex, assign_ids_py

N_DOCS = 120


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_corpus(spark, N_DOCS, max_tokens=300, partitions=4).persist()


@pytest.fixture(scope="module")
def index(corpus):
    idx = build_index(corpus, shard_size=32)
    idx.shards.persist()
    idx.docstore.persist()
    return idx


@pytest.fixture(scope="module")
def oracle(index):
    rows = index.docstore.select("doc_id", "content").collect()
    return OracleIndex.build({r["doc_id"]: r["content"] for r in rows})


def test_corpus_matches_python_twin(corpus):
    got = {r["path"]: r for r in corpus.collect()}
    want = synth_corpus_rows(N_DOCS, max_tokens=300)
    assert len(got) == N_DOCS
    for w in want:
        g = got[w["path"]]
        assert g["content"] == w["content"]
        assert g["commit"] == w["commit"]


def test_doc_ids_dense_and_deterministic(spark, corpus):
    a = assign_doc_ids(corpus, mode="hash")
    ids = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    assert ids == list(range(N_DOCS))
    # parallelism invariance: same ids from a differently-partitioned input
    b = assign_doc_ids(corpus.repartition(13), mode="hash")
    ma = {(r["repo"], r["path"]): r["doc_id"] for r in a.collect()}
    mb = {(r["repo"], r["path"]): r["doc_id"] for r in b.collect()}
    assert ma == mb
    # python twin agreement (independent md5-bucket implementation)
    rows = synth_corpus_rows(N_DOCS, max_tokens=300)
    py = assign_ids_py(rows)
    for r in corpus.collect():
        assert ma[(r["repo"], r["path"])] == py[(r["repo"], r["path"], r["commit"])]


def test_doc_ids_sort_mode(spark, corpus):
    a = assign_doc_ids(corpus, mode="sort")
    rows = a.select("repo", "path", "commit", "doc_id").collect()
    by_key = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    assert [r["doc_id"] for r in by_key] == list(range(N_DOCS))


def test_sha256_invariant(spark, corpus):
    docs = verify_sha256(corpus)
    import hashlib

    r = docs.select("content", "content_sha256").first()
    assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()
    # a corrupted row must fail the build
    bad = docs.withColumn(
        "content", F.when(F.rand(1) < 2.0, F.lit("tampered")).otherwise(F.col("content"))
    )
    with pytest.raises(ValueError, match="sha256 invariant"):
        verify_sha256(bad)


def test_postings_invariants(index, oracle):
    # df == number of postings rows per term
    df_check = (
        index.postings.groupBy("term").count()
        .join(index.terms, "term")
        .filter(F.col("count") != F.col("df"))
        .count()
    )
    assert df_check == 0
    # postings tf match the oracle exactly
    got = {
        (r["term"], r["doc_id"]): r["tf"] for r in index.postings.collect()
    }
    want = {
        (t, d): tf for t, m in oracle.tf.items() for d, tf in m.items()
    }
    assert got == want
    # doc lengths match oracle (graph overlaps discounted)
    dls = {r["doc_id"]: r["dl"] for r in index.doclens.collect()}
    assert dls == oracle.dl
    assert index.n_docs == N_DOCS
    assert abs(index.avgdl - oracle.avgdl) < 1e-9


def test_shard_roundtrip(index, oracle):
    """Decoding every compressed shard row reproduces the flat postings."""
    rows = index.shards.collect()
    seen = {}
    for r in rows:
        base = r["shard"] * index.shard_size
        d, t = codec.decode_postings(r["doc_blob"], r["tf_blob"], r["n"], base=base)
        assert (np.diff(d) > 0).all()  # sorted, unique
        assert ((d >= base) & (d < base + index.shard_size)).all()
        pos = codec.decode_positions(r["pos_blob"], t)
        for i, doc in enumerate(d):
            seen[(r["term"], int(doc))] = (int(t[i]), [int(x) for x in pos[i]])
    want = {
        (term, doc): (tf, oracle.pos[term][doc])
        for term, m in oracle.tf.items()
        for doc, tf in m.items()
    }
    assert seen == want


def test_docstore_lookup(index):
    """getDocument analogue (ElasticsearchClientV8.java:249-252)."""
    row = index.docstore.filter(F.col("doc_id") == 5).collect()
    assert len(row) == 1
    assert row[0]["content_sha256"] is not None


def test_empty_and_tokenless_docs(spark):
    """Docs with empty content: stored in the docstore, excluded from N
    (Lucene field docCount semantics), invisible to term queries."""
    from limetrans_spark.operators import query as Q

    df = spark.createDataFrame(
        [
            ("r", "a", "c1", "py", "alpha beta"),
            ("r", "b", "c2", "py", ""),
            ("r", "c", "c3", "py", "(((  )))"),  # punctuation only
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    idx = build_index(df, shard_size=8)
    assert idx.n_docs == 1
    assert idx.docstore.count() == 3  # all rows stored
    assert Q.matching_docs_df(idx, "alpha").count() == 1
    assert Q.bm25_topk_df(idx, "", k=10).count() == 3  # match_all sees all


def test_get_document_point_lookup(spark):
    from limetrans_spark.operators.build import build_index
    from limetrans_spark.sources.corpus import synth_corpus

    idx = build_index(synth_corpus(spark, 30, partitions=2), shard_size=16)
    some = idx.docstore.select("doc_id").orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    doc = idx.get_document(some)
    assert doc is not None and doc["doc_id"] == some and "content" in doc
    assert idx.get_document(10**12) is None


def test_invert_token_stream_positions_and_dl(spark):
    """invert_token_stream: tf = occurrences, dl = distinct position
    slots (overlap tokens at one slot count once), pos_blob round-trips
    the exact gapped positions — across partition boundaries."""
    import numpy as np

    from limetrans_spark.operators import codec
    from limetrans_spark.operators.build import invert_token_stream

    rows = []
    for doc in range(6):
        rows += [(doc, "alpha", 0), (doc, "beta", 1), (doc, "alpha", 2)]
        rows += [(doc, "stem", 1)]  # overlap token at slot 1
        rows += [(doc, "far", 1_000_000 + doc)]  # COPY_GAP-style offset
    toks = spark.createDataFrame(rows, "doc_id long, term string, pos int").repartition(5)
    out = invert_token_stream(toks, num_partitions=3).collect()
    by_key = {(r["doc_id"], r["term"]): r for r in out}
    for doc in range(6):
        assert by_key[(doc, "alpha")]["tf"] == 2
        assert by_key[(doc, "alpha")]["dl"] == 4  # slots {0,1,2,1e6+doc}
        pos = np.cumsum(
            codec.varint_decode(bytes(by_key[(doc, "far")]["pos_blob"]), 1)
        ).tolist()
        assert pos == [1_000_000 + doc]
        pos_a = np.cumsum(
            codec.varint_decode(bytes(by_key[(doc, "alpha")]["pos_blob"]), 2)
        ).tolist()
        assert pos_a == [0, 2]


def test_build_cache_is_content_free(spark):
    """Round-4: build_index persists only (doc_id, dl, postings) — peak
    storage bytes must NOT scale with the corpus' content bytes.  The
    two corpora below tokenize IDENTICALLY (the padding is separator
    chars the simple analyzer drops), but one carries ~1 MB more raw
    content; their cached footprints must match."""
    from limetrans_spark.operators.build import build_index

    def cached_bytes():
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return sum(i.memSize() + i.diskSize() for i in infos)

    def build_and_measure(rows):
        spark.catalog.clearCache()
        df = spark.createDataFrame(rows, "doc_id long, content string")
        idx = build_index(df, analyzer="simple", shard_size=16)
        idx.shards.count()  # force every derivation through the cache
        b = cached_bytes()
        spark.catalog.clearCache()
        return b, idx

    small = [(i, f"alpha beta w{i}") for i in range(50)]
    pad = "." * 20_000  # 20 KB of token-free separators per doc
    big = [(i, f"alpha beta w{i} {pad}") for i in range(50)]

    b_small, idx_s = build_and_measure(small)
    b_big, idx_b = build_and_measure(big)
    # same index → (nearly) same cache; the 1 MB content delta must not
    # appear in storage (pre-fix it did: the full text rode in the cache)
    assert b_big - b_small < 200_000, (b_small, b_big)
    # the docstore still serves content (lazy view over the input)
    doc = idx_b.get_document(3)
    assert doc["content"].startswith("alpha beta w3") and doc["dl"] == 3
    # and the same docs/scores come out of the content-free build
    from limetrans_spark.operators import query as Q

    a = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_df(idx_s, "alpha w1", k=5).collect()]
    b = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_df(idx_b, "alpha w1", k=5).collect()]
    assert a == b and a[0][0] == 1


def test_spimi_writer_batch_seam_byte_identity():
    """The Arrow-native SPIMI writer is byte-identical to per-run
    ``codec.encode_postings`` / plain byte-joins even when a (shard,
    term) run spans several Arrow batches (the carry path), including a
    run longer than any single batch and a trailing single-run batch."""
    import pyarrow as pa

    from limetrans_spark.operators.build import _spimi_writer

    shard_size = 64
    rng = np.random.default_rng(3)
    rows = []  # (shard, term, doc_id) sorted; tf/pos derived
    for shard, term, docs in [
        (0, "alpha", range(0, 5)),
        (0, "beta", range(1, 40)),     # spans several 8-row batches
        (0, "gamma", [7]),
        (1, "beta", range(64, 70)),    # same term, new shard => new run
        (1, "delta", range(65, 80)),   # trailing run hits the final-carry path
    ]:
        for d in docs:
            npos = int(rng.integers(1, 5))
            pos = np.unique(rng.integers(0, 50, size=npos)).astype(np.int64)
            rows.append((shard, term, d, len(pos), codec.encode_positions([pos])))

    arrays = [
        pa.array([r[0] for r in rows], type=pa.int32()),
        pa.array([r[1] for r in rows], type=pa.string()),
        pa.array([r[2] for r in rows], type=pa.int64()),
        pa.array([r[3] for r in rows], type=pa.int32()),
        pa.array([r[4] for r in rows], type=pa.binary()),
    ]
    names = ["shard", "term", "doc_id", "tf", "pos_blob"]
    full = pa.RecordBatch.from_arrays(arrays, names=names)
    batches = [full.slice(i, 8) for i in range(0, full.num_rows, 8)]

    out = pa.Table.from_batches(list(_spimi_writer(shard_size)(iter(batches))))

    # reference: per-run encode over the undivided input
    want = {}
    by_run: dict[tuple[int, str], list] = {}
    for r in rows:
        by_run.setdefault((r[0], r[1]), []).append(r)
    for (shard, term), rs in by_run.items():
        d = np.array([r[2] for r in rs], dtype=np.int64)
        t = np.array([r[3] for r in rs], dtype=np.int64)
        doc_blob, tf_blob, bl, bm = codec.encode_postings(
            d, t, base=shard * shard_size
        )
        want[(shard, term)] = {
            "n": len(rs),
            "doc_blob": doc_blob,
            "tf_blob": tf_blob,
            "pos_blob": b"".join(r[4] for r in rs),
            "block_last": bl,
            "block_max_tf": bm,
            "sum_tf": int(t.sum()),
        }

    got = {
        (r["shard"], r["term"]): r for r in out.to_pylist()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["n"] == w["n"], k
        assert g["doc_blob"] == w["doc_blob"], k
        assert g["tf_blob"] == w["tf_blob"], k
        assert g["pos_blob"] == w["pos_blob"], k
        assert list(g["block_last"]) == [int(x) for x in w["block_last"]], k
        assert list(g["block_max_tf"]) == [int(x) for x in w["block_max_tf"]], k
        assert g["sum_tf"] == w["sum_tf"], k


def _shard_rows_dict(df):
    return {
        (r["shard"], r["term"]): (
            r["n"], r["doc_blob"], r["tf_blob"], r["pos_blob"],
            list(r["block_last"]), list(r["block_max_tf"]), r["sum_tf"],
        )
        for r in df.collect()
    }


def test_docwise_shards_byte_identity(spark):
    """build_shards_docwise (doc-level shuffle, C-side per-shard
    flatten+sort) emits byte-identical shard rows to the streaming
    range strategy — including shards spanning Arrow batches, docs with
    empty postings, and the positions-free variant."""
    from limetrans_spark.operators.build import (
        build_shards,
        build_shards_docwise,
        explode_postings,
        invert_docs,
    )

    base = assign_doc_ids(synth_corpus(spark, 600, max_tokens=120, partitions=8))
    # splice in tokenless docs so some shard groups carry empty lists
    docs = base.withColumn(
        "content",
        F.when(F.col("doc_id") % 97 == 0, F.lit("")).otherwise(F.col("content")),
    )
    lean = invert_docs(docs, "content", "code").select(
        "doc_id", "dl", "postings"
    ).persist()
    post = explode_postings(lean)
    shard_size = 16  # 38 shards >> the 8 test cores; groups span batches

    got = _shard_rows_dict(build_shards_docwise(lean, shard_size))
    want = _shard_rows_dict(build_shards(post, shard_size))
    assert got == want and len(want) > 500

    got_np = _shard_rows_dict(
        build_shards_docwise(lean, shard_size, with_positions=False)
    )
    want_np = _shard_rows_dict(build_shards(post.drop("pos_blob"), shard_size))
    assert got_np == want_np
    lean.unpersist()


def test_shards_strategy_choice_and_build_index_metric(spark):
    from limetrans_spark.operators.build import choose_shards_strategy

    # parallelism gate: needs >= 2 whole shards per partition
    assert choose_shards_strategy(10_000, 50.0, 64, 8) == "docwise"
    assert choose_shards_strategy(500, 50.0, 64, 8) == "range"
    # memory gate: one shard's postings must fit a task
    assert choose_shards_strategy(10**9, 200.0, 1 << 20, 8) == "range"

    idx = build_index(synth_corpus(spark, 300, partitions=4), shard_size=16)
    assert idx.metrics["shards_strategy"] == "docwise"
    # the docwise-built index serves rank-identical BM25 vs the DF tier
    from limetrans_spark.operators import query as Q

    a = Q.bm25_topk_df(idx, "parse json", k=5).collect()
    b = Q.bm25_topk_sharded(idx, "parse json", k=5).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert all(abs(x["score"] - y["score"]) < 1e-9 for x, y in zip(a, b))


def test_docwise_rejects_negative_doc_ids(spark):
    """Negative doc_ids would make the SQL shard routing (truncating
    division) disagree with the in-UDF floor division; fail fast."""
    from limetrans_spark.operators.build import build_shards_docwise, invert_docs

    docs = spark.createDataFrame(
        [(-5, "alpha beta"), (3, "beta gamma")], "doc_id long, content string"
    )
    lean = invert_docs(docs, "content", "simple").select("doc_id", "dl", "postings")
    with pytest.raises(Exception, match="non-negative"):
        build_shards_docwise(lean, 8).collect()
