"""Structured Streaming ingest + multimodal binary plumbing +
standard-number validation."""

import json
import os

import pytest
from pyspark.sql import functions as F

from limetrans_spark.multimodal.binary import (
    decode_assets,
    extract_embeddings,
    sample_frames,
)
from limetrans_spark.streaming import ingest


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_incremental_index(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "postings")
    ckpt = str(tmp_path / "ckpt")
    _write_jsonl(
        f"{landing}/harvest1.jsonl",
        [
            {"doc_id": 0, "repo": "r", "path": "a", "commit": "c1", "lang": "py",
             "content": "parse json fast"},
            {"doc_id": 1, "repo": "r", "path": "b", "commit": "c2", "lang": "py",
             "content": "merge segments slowly"},
        ],
    )
    stream = ingest.corpus_stream(spark, landing)
    q = ingest.incremental_index(stream, out, ckpt)
    q.awaitTermination(120)

    # second harvest window: new doc + re-index of doc 1 (replace semantics)
    _write_jsonl(
        f"{landing}/harvest2.jsonl",
        [
            {"doc_id": 1, "repo": "r", "path": "b", "commit": "c3", "lang": "py",
             "content": "merge merge merge"},
            {"doc_id": 2, "repo": "r", "path": "c", "commit": "c4", "lang": "py",
             "content": "tokenize stream"},
        ],
    )
    q2 = ingest.incremental_index(ingest.corpus_stream(spark, landing), out, ckpt)
    q2.awaitTermination(120)

    merged = ingest.read_postings_deltas(spark, out)
    by_key = {(r["term"], r["doc_id"]): r["tf"] for r in merged.collect()}
    assert by_key[("parse", 0)] == 1
    assert by_key[("merge", 1)] == 3  # batch 2 wins (last-write)
    assert by_key[("tokenize", 2)] == 1
    # replace semantics: the re-index of doc 1 must ERASE postings for
    # terms absent from the new content, not just update shared terms
    assert ("segments", 1) not in by_key
    assert ("slowly", 1) not in by_key
    assert {t for t, d in by_key if d == 1} == {"merge"}


def test_windowed_event_counts_batch_semantics(spark):
    # watermark semantics exercised via the batch-equivalent aggregation
    ev = spark.createDataFrame(
        [("2020-01-01 10:05:00", "click"), ("2020-01-01 10:55:00", "click"),
         ("2020-01-01 11:05:00", "view")],
        "ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ingest.windowed_event_counts(ev, window="1 hour")
    rows = {(str(r["window_start"]), r["event_type"]): r["n_events"] for r in out.collect()}
    assert rows[("2020-01-01 10:00:00", "click")] == 2
    assert rows[("2020-01-01 11:00:00", "view")] == 1


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (0, "image", bytes([7, 3] + list(range(100))), {"src": "a"}),
        (1, "video", bytes(range(64)), {"src": "b"}),
        (2, "audio", b"", {}),
    ]
    return spark.createDataFrame(rows, "asset_id long, kind string, payload binary, meta map<string,string>")


def test_decode_assets(assets):
    out = {r["asset_id"]: r for r in decode_assets(assets).collect()}
    assert out[0]["width"] == 8 and out[0]["height"] == 4
    assert out[0]["n_bytes"] == 102
    assert out[2]["n_bytes"] == 0
    # deterministic across re-runs
    again = {r["asset_id"]: r for r in decode_assets(assets).collect()}
    assert out[0]["sha256"] == again[0]["sha256"]


def test_sample_frames_fanout(assets):
    frames = sample_frames(assets, n_frames=4).collect()
    assert len(frames) == 4  # only the video row fans out
    assert sorted({f["asset_id"] for f in frames}) == [1]
    assert sorted(f["frame_no"] for f in frames) == [0, 1, 2, 3]
    assert all(len(f["frame_bytes"]) > 0 for f in frames)


def test_extract_embeddings_unit_norm(assets):
    import math

    out = {r["asset_id"]: r["embedding"] for r in extract_embeddings(assets).collect()}
    assert len(out[0]) == 16
    n = math.sqrt(sum(x * x for x in out[0]))
    assert abs(n - 1.0) < 1e-5
    # same payload → same embedding; different payloads differ
    assert out[0] != out[1]


def test_standard_numbers(spark):
    from limetrans_spark.functions.standard_number import standard_number_udf

    df = spark.createDataFrame(
        [("0-306-40615-2",), ("9780306406157",), ("0-306-40615-3",), (None,)],
        "raw string",
    )
    out = df.select(standard_number_udf("ISBN")(F.col("raw")).alias("r")).collect()
    r0, r1, r2, r3 = [r["r"] for r in out]
    assert r0["valid"] and r0["preferred"] == "9780306406157"
    assert "0306406152" in r0["variants"]
    assert r1["valid"] and "0306406152" in r1["variants"]
    assert not r2["valid"]  # bad check digit
    assert not r3["valid"]

    issn = spark.createDataFrame([("0378-5955",), ("0378-5954",)], "raw string")
    rr = issn.select(standard_number_udf("ISSN")(F.col("raw")).alias("r")).collect()
    assert rr[0]["r"]["valid"] and rr[0]["r"]["preferred"] == "0378-5955"
    assert not rr[1]["r"]["valid"]

    # mod-11, weights 2.. from the right: 2073457 → 118 % 11 = 8
    zdb = spark.createDataFrame([("2073457-8",), ("2073457-4",)], "raw string")
    zz = zdb.select(standard_number_udf("ZDB")(F.col("raw")).alias("r")).collect()
    assert zz[0]["r"]["valid"] and zz[0]["r"]["preferred"] == "2073457-8"
    assert not zz[1]["r"]["valid"]


def test_stateful_sessionization(spark, tmp_path):
    """Custom stateful streaming operator (applyInPandasWithState):
    gap-based sessionization with state carried across micro-batch runs
    via the streaming checkpoint."""
    import json as _json

    from limetrans_spark.streaming.sessionize import sessionize

    landing = tmp_path / "in"
    landing.mkdir()
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        with open(landing / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, ts string, value double")
            .json(str(landing))
            .withColumn("ts", F.to_timestamp("ts"))
        )
        q = (
            sessionize(stream, gap="30 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None

    write("b1.jsonl", [
        {"user_id": 1, "ts": "2020-01-01 10:00:00", "value": 1.0},
        {"user_id": 1, "ts": "2020-01-01 10:10:00", "value": 2.0},
        {"user_id": 1, "ts": "2020-01-01 12:30:00", "value": 3.0},
        {"user_id": 2, "ts": "2020-01-01 09:00:00", "value": 5.0},
    ])
    run_once()
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    # user 1's first session (2 events) closed by the 12:30 gap; user 2 open
    assert got == {(1, "2020-01-01 10:00:00"): (2, 3.0)}

    # a later event for user 1 closes the 12:30 session (state recovered
    # from the checkpoint across separate streaming runs)
    write("b2.jsonl", [{"user_id": 1, "ts": "2020-01-01 15:00:00", "value": 7.0}])
    run_once()
    got2 = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == {
        (1, "2020-01-01 10:00:00"): (2, 3.0),
        (1, "2020-01-01 12:30:00"): (1, 3.0),
    }


def test_oai_pmh_harvest_window(spark):
    """OaiPmhQueue parity (OaiPmhQueue.java:18-59): [from, until) window,
    set filtering, resumption-token-style paging via the injected
    fetcher; transport is pluggable (no HTTP in this sandbox)."""
    pages_served = []

    def fake_fetcher(uri, params):
        assert uri == "https://example.org/oai"
        assert params["metadataPrefix"] == "marcxml"
        recs = [
            {"identifier": f"oai:{i}", "datestamp": f"2026-01-{i:02d}T00:00:00Z",
             "set_spec": "code" if i % 2 == 0 else "docs", "metadata": f"<r>{i}</r>"}
            for i in range(1, 11)
        ]
        for start in (0, 5):  # two pages, like a resumption token
            pages_served.append(start)
            yield recs[start : start + 5]

    q = ingest.OaiPmhQueue(
        "https://example.org/oai",
        date_from="2026-01-03T00:00:00Z",
        date_until="2026-01-09T00:00:00Z",
        set_spec="code",
        fetcher=fake_fetcher,
    )
    got = sorted(r["identifier"] for r in q.harvest(spark).collect())
    # window keeps days 3..8; set 'code' keeps even days → 4, 6, 8
    assert got == ["oai:4", "oai:6", "oai:8"]
    assert pages_served == [0, 5]
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        ingest.OaiPmhQueue("https://example.org/oai")


def test_compact_deltas_equals_batch_rebuild(spark, tmp_path):
    """compact(incremental batches) ≡ batch build over the final corpus
    state: identical BM25 top-k (ids AND scores) — the reference's
    daily-rebuild vs incremental-update equivalence."""
    from limetrans_spark.operators import query as Q
    from limetrans_spark.operators.build import build_index

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "postings")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [
        {"doc_id": 0, "repo": "r", "path": "a", "commit": "c", "lang": "py",
         "content": "merge sort fast merge"},
        {"doc_id": 1, "repo": "r", "path": "b", "commit": "c", "lang": "py",
         "content": "hash join slow"},
    ]
    batch2 = [
        {"doc_id": 1, "repo": "r", "path": "b", "commit": "c2", "lang": "py",
         "content": "merge join fast"},  # re-index: replaces doc 1
        {"doc_id": 2, "repo": "r", "path": "c", "commit": "c", "lang": "py",
         "content": "sort merge join"},
    ]
    _write_jsonl(f"{landing}/h1.jsonl", batch1)
    ingest.incremental_index(ingest.corpus_stream(spark, landing), out, ckpt).awaitTermination(120)
    _write_jsonl(f"{landing}/h2.jsonl", batch2)
    ingest.incremental_index(ingest.corpus_stream(spark, landing), out, ckpt).awaitTermination(120)

    compacted = ingest.compact_deltas(spark, out, shard_size=64)

    final_state = [batch1[0], batch2[0], batch2[1]]  # last write per doc
    fresh = build_index(
        spark.createDataFrame(
            [(r["doc_id"], r["content"]) for r in final_state], "doc_id long, content string"
        ),
        analyzer="simple", shard_size=64, with_positions=False,
    )
    assert compacted.n_docs == fresh.n_docs
    assert abs(compacted.avgdl - fresh.avgdl) < 1e-12
    for q in ["merge", "merge join", "sort | join"]:
        a = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_df(compacted, q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_df(fresh, q, k=10).collect()]
        assert a == b, q
    # sharded path over the compacted shards agrees too
    c = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_sharded(compacted, "merge | join", k=10).collect()]
    d = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_sharded(fresh, "merge | join", k=10).collect()]
    assert c == d


def test_sessionize_batch_twin_matches_streaming(spark, tmp_path):
    """The batch twin (oracle-gated) and the stateful streaming operator
    implement the same gap semantics: streaming's CLOSED sessions equal
    the batch sessions minus each user's final (still-open) session."""
    import json as _json

    from limetrans_spark.streaming.sessionize import sessionize, sessionize_batch

    rows = [
        {"user_id": 1, "ts": "2020-01-01 10:00:00", "value": 1.0},
        {"user_id": 1, "ts": "2020-01-01 10:10:00", "value": 2.0},
        {"user_id": 1, "ts": "2020-01-01 12:30:00", "value": 3.0},
        {"user_id": 1, "ts": "2020-01-01 15:00:00", "value": 7.0},
        {"user_id": 2, "ts": "2020-01-01 09:00:00", "value": 5.0},
        {"user_id": 2, "ts": "2020-01-01 09:05:00", "value": 5.0},
    ]
    landing = tmp_path / "in"
    landing.mkdir()
    with open(landing / "b.jsonl", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("user_id long, ts string, value double")
        .json(str(landing))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = str(tmp_path / "sess")
    q = (
        sessionize(stream, gap="30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    batch_df = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["value"]) for r in rows], "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    batch = sessionize_batch(batch_df, gap_seconds=1800.0)
    allb = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    # drop each user's final session (open in the streaming view)
    last = {}
    for t in allb:
        if t[0] not in last or t[1] > last[t[0]][1]:
            last[t[0]] = t
    assert streamed == allb - set(last.values())
    # user 1: [10:00-10:10], [12:30], [15:00]; user 2: [09:00-09:05] → 4
    # sessions total; the two non-final user-1 sessions are closed
    assert len(allb) == 4 and len(streamed) == 2


def test_compact_deltas_code_analyzer_overlap_dl(spark, tmp_path):
    """Regression: the default code analyzer emits overlap tokens
    (catenated/original at posInc 0) for camelCase/underscore
    identifiers, so compacted dl must come from the carried dl column —
    dl = Σtf would inflate length norms and break compact ≡ rebuild."""
    from limetrans_spark.operators import query as Q
    from limetrans_spark.operators.build import build_index

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "postings")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [
        {"doc_id": 0, "repo": "r", "path": "a", "commit": "c", "lang": "py",
         "content": "parseJson fastPath parseJson mergeSort"},
        {"doc_id": 1, "repo": "r", "path": "b", "commit": "c", "lang": "py",
         "content": "hash_join slow_scan"},
    ]
    batch2 = [
        {"doc_id": 1, "repo": "r", "path": "b", "commit": "c2", "lang": "py",
         "content": "mergeSort hashJoin fast"},  # replaces doc 1
        {"doc_id": 2, "repo": "r", "path": "c", "commit": "c", "lang": "py",
         "content": "sortKey mergeSort hashJoin"},
    ]
    _write_jsonl(f"{landing}/h1.jsonl", batch1)
    ingest.incremental_index(ingest.corpus_stream(spark, landing), out, ckpt).awaitTermination(120)
    _write_jsonl(f"{landing}/h2.jsonl", batch2)
    ingest.incremental_index(ingest.corpus_stream(spark, landing), out, ckpt).awaitTermination(120)

    compacted = ingest.compact_deltas(spark, out, shard_size=64)

    final_state = [batch1[0], batch2[0], batch2[1]]
    fresh = build_index(
        spark.createDataFrame(
            [(r["doc_id"], r["content"]) for r in final_state], "doc_id long, content string"
        ),
        analyzer="code", shard_size=64, with_positions=False,
    )
    # the fixture is overlap-heavy by construction: dl ≠ Σtf everywhere
    dl = {r["doc_id"]: r["dl"] for r in compacted.doclens.collect()}
    sum_tf = {
        r["doc_id"]: r["s"]
        for r in compacted.postings.groupBy("doc_id").agg(F.sum("tf").alias("s")).collect()
    }
    assert all(dl[d] < sum_tf[d] for d in dl), (dl, sum_tf)
    assert compacted.n_docs == fresh.n_docs
    assert abs(compacted.avgdl - fresh.avgdl) < 1e-12
    for q in ["merge sort", "merge | hash", "mergesort", "parse"]:
        a = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_df(compacted, q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_df(fresh, q, k=10).collect()]
        assert a == b, q


def test_compact_deltas_rejects_mixed_formats(spark, tmp_path):
    """ADVICE r3: a delta dir mixing dl-less legacy batches with
    dl-carrying batches must fail fast (naming the legacy batches), not
    silently drop dl or propagate null doclens — plain parquet reads
    infer schema from one arbitrary footer, so the outcome was
    footer-order-dependent before the mergeSchema + null-dl guard."""
    import pytest

    out = str(tmp_path / "postings")
    # legacy batch 0: no dl column
    spark.createDataFrame(
        [(0, "alpha", 2, 0)], "doc_id long, term string, tf int, batch int"
    ).write.mode("append").partitionBy("batch").parquet(out)
    # current-format batch 1: carries dl
    spark.createDataFrame(
        [(1, "beta", 1, 3, 1)], "doc_id long, term string, tf int, dl long, batch int"
    ).write.mode("append").partitionBy("batch").parquet(out)

    with pytest.raises(ValueError, match=r"mixed delta formats.*\[0\]"):
        ingest.read_postings_deltas(spark, out)

    # a homogeneous dl-carrying dir still reads fine
    out2 = str(tmp_path / "postings2")
    spark.createDataFrame(
        [(1, "beta", 1, 3, 1)], "doc_id long, term string, tf int, dl long, batch int"
    ).write.mode("append").partitionBy("batch").parquet(out2)
    assert ingest.read_postings_deltas(spark, out2).count() == 1
    # and a homogeneous legacy dir routes to the legacy branch unharmed
    out3 = str(tmp_path / "postings3")
    spark.createDataFrame(
        [(0, "alpha", 2, 0)], "doc_id long, term string, tf int, batch int"
    ).write.mode("append").partitionBy("batch").parquet(out3)
    assert "dl" not in ingest.read_postings_deltas(spark, out3).columns


def test_stream_segment_updates(spark, tmp_path):
    """Streaming segment ingestion: each micro-batch absorbed as a
    chained delta segment; the served chain head is bit-identical to a
    batch rebuild over the cumulative stream state after every trigger,
    deletion records tombstone without delta docs, replays are skipped,
    and a compaction fold re-bases the chain."""
    from pyspark.sql import types as T

    from limetrans_spark.operators.build import build_index
    from limetrans_spark.operators.serve import LocalSearcher, SegmentedSearcher
    from limetrans_spark.plans import lifecycle as lc

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "segroot")
    ckpt = str(tmp_path / "ckpt")

    base_rows = [
        (0, "alpha beta gamma"),
        (1, "delta epsilon zeta"),
        (2, "eta theta iota"),
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, content string")
    base_snap = lc.save_index(
        build_index(base, shard_size=16), str(tmp_path / "base"), "s", "g1"
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.StringType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(landing)
        )
        q = ingest.stream_segment_updates(
            stream, base_snap, root, ckpt, deleted_col="deleted"
        )
        q.awaitTermination(120)

    # batch 0: update doc 1 + append doc 3
    _write_jsonl(f"{landing}/b0.jsonl", [
        {"doc_id": 1, "content": "streamseg fresh alpha", "deleted": False},
        {"doc_id": 3, "content": "streamseg appended", "deleted": False},
    ])
    run_stream()
    # batch 1: DELETION-ONLY (doc 0 tombstones, no delta doc)
    _write_jsonl(f"{landing}/b1.jsonl", [
        {"doc_id": 0, "content": None, "deleted": True},
    ])
    run_stream()

    head = ingest.stream_head(root)
    seg = SegmentedSearcher.from_chain(head)
    assert len(seg.searchers) == 3

    final = spark.createDataFrame(
        [(1, "streamseg fresh alpha"), (2, "eta theta iota"),
         (3, "streamseg appended")],
        "doc_id long, content string",
    )
    full = LocalSearcher.from_index(build_index(final, shard_size=16))
    for q in ["streamseg", "alpha", "eta | zeta", "alpha -appended"]:
        a = [(d, round(s, 9)) for d, s in full.search(q, k=10)]
        b = [(d, round(s, 9)) for d, s in seg.search(q, k=10)]
        assert a == b, (q, a, b)
    assert seg.get_document(0) is None
    assert seg.get_document(1)["content"] == "streamseg fresh alpha"

    # replay safety: re-running with no new files adds no segments
    run_stream()
    assert ingest.stream_head(root) == head

    # compaction fold between runs, then one more batch chains from it
    cc = lc.compact_segments(spark, head, str(tmp_path / "cc"), "s", "g2")
    ingest.set_stream_head(root, cc, batch_id=1)
    _write_jsonl(f"{landing}/b2.jsonl", [
        {"doc_id": 4, "content": "postcompact kappa", "deleted": False},
    ])
    run_stream()
    head2 = ingest.stream_head(root)
    seg2 = SegmentedSearcher.from_chain(head2)
    assert len(seg2.searchers) == 2  # compacted base + one new delta
    hits = seg2.search("postcompact", k=5)
    assert [d for d, _ in hits] == [4]
    assert [d for d, _ in seg2.search("streamseg", k=5)] == [1, 3] or \
           {d for d, _ in seg2.search("streamseg", k=5)} == {1, 3}


def test_stream_segment_auto_compaction(spark, tmp_path):
    """``max_depth`` merge policy: when a trigger leaves the chain
    deeper than the bound, the stack folds into a fresh base inside the
    trigger — the served head never exceeds ``max_depth`` segments and
    stays bit-identical to a batch rebuild over the cumulative state."""
    import json as _json
    import os as _os

    from pyspark.sql import types as T

    from limetrans_spark.operators.build import build_index
    from limetrans_spark.operators.serve import LocalSearcher, SegmentedSearcher
    from limetrans_spark.plans import lifecycle as lc

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "segroot")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "epsilon zeta")],
        "doc_id long, content string",
    )
    base_snap = lc.save_index(
        build_index(base, shard_size=16), str(tmp_path / "base"), "s", "g1"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.StringType()),
        ]
    )

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(landing)
        )
        q = ingest.stream_segment_updates(
            stream, base_snap, root, ckpt, max_depth=2
        )
        q.awaitTermination(180)

    _write_jsonl(f"{landing}/b0.jsonl", [
        {"doc_id": 1, "content": "autocompact one"},
        {"doc_id": 3, "content": "autocompact appended"},
    ])
    _write_jsonl(f"{landing}/b1.jsonl", [
        {"doc_id": 3, "content": "autocompact two"},
    ])
    _write_jsonl(f"{landing}/b2.jsonl", [
        {"doc_id": 4, "content": "autocompact three"},
    ])
    run_stream()

    head = ingest.stream_head(root)
    chain = lc.segment_chain(head)
    assert len(chain) <= 2  # b1's publish hit depth 3 -> folded, b2 chains
    # the fold happened at batch 1 and published without a segment_of link
    cbase = chain[0]
    assert "compact-b1" in cbase
    with open(_os.path.join(cbase, "manifest.json")) as f:
        assert "segment_of" not in (_json.load(f).get("metrics") or {})

    final = spark.createDataFrame(
        [(0, "alpha beta"), (1, "autocompact one"), (2, "epsilon zeta"),
         (3, "autocompact two"), (4, "autocompact three")],
        "doc_id long, content string",
    )
    full = LocalSearcher.from_index(build_index(final, shard_size=16))
    seg = SegmentedSearcher.from_chain(head)
    for q in ["autocompact", "alpha | zeta", "autocompact -three",
              '"autocompact two"']:
        a = [(d, round(s, 9)) for d, s in full.search(q, k=10)]
        b = [(d, round(s, 9)) for d, s in seg.search(q, k=10)]
        assert a == b, (q, a, b)

    # the checker trusts the folded head too (plain-or-stack dispatch)
    assert lc.check_index(spark, head, deep=True)["ok"]


def test_stream_fielded_segment_updates(spark, tmp_path):
    """Fielded streaming ingestion: micro-batches land as per-field
    delta trees chained on FIELDED_STREAM_HEAD; deletions tombstone all
    fields; max_depth folds the stack inside the trigger; the served
    head is bit-identical to a fielded rebuild over the final state."""
    from pyspark.sql import types as T

    from limetrans_spark.operators import fielded as FL
    from limetrans_spark.plans import lifecycle as lc

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "froot")
    ckpt = str(tmp_path / "ckpt")
    FIELDS = {"title": ("title", "simple"), "body": ("body", "simple")}
    COPY = {"title": ["all"]}

    base = spark.createDataFrame(
        [(0, "red fox", "jumps high"), (1, "blue bird", "sings loud"),
         (2, "green frog", "swims far")],
        "doc_id long, title string, body string",
    )
    base_root = str(tmp_path / "base")
    lc.save_fielded(
        FL.build_fielded_sharded(base, FIELDS, copy_to=COPY, shard_size=16),
        base_root, "s", "g1",
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
    ])

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(landing)
        )
        q = ingest.stream_fielded_segment_updates(
            stream, base_root, root, ckpt,
            fields=FIELDS, copy_to=COPY, deleted_col="deleted",
            max_depth=2,
        )
        q.awaitTermination(240)

    _write_jsonl(f"{landing}/b0.jsonl", [
        {"doc_id": 1, "title": "fstream bird", "body": "sings loud",
         "deleted": False},
        {"doc_id": 3, "title": "fstream newdoc", "body": "flies away",
         "deleted": False},
    ])
    _write_jsonl(f"{landing}/b1.jsonl", [
        {"doc_id": 0, "title": None, "body": None, "deleted": True},
    ])
    _write_jsonl(f"{landing}/b2.jsonl", [
        {"doc_id": 3, "title": "fstream renamed", "body": "flies away",
         "deleted": False},
    ])
    run_stream()

    head = ingest.fielded_stream_head(root)
    chain = lc.fielded_segment_chain(head)
    assert len(chain) <= 2  # b1 left depth 3 -> folded inside the trigger
    assert "compact-b1" in chain[0]

    final = spark.createDataFrame(
        [(1, "fstream bird", "sings loud"), (2, "green frog", "swims far"),
         (3, "fstream renamed", "flies away")],
        "doc_id long, title string, body string",
    )
    re_root = str(tmp_path / "re")
    lc.save_fielded(
        FL.build_fielded_sharded(final, FIELDS, copy_to=COPY, shard_size=16),
        re_root, "s", "g2",
    )
    rebuilt = FL.LocalFieldedSharded.from_snapshot(re_root)
    seg = (
        FL.SegmentedFielded.from_chain(head)
        if len(chain) > 1 else FL.LocalFieldedSharded.from_snapshot(head)
    )
    for q in ["title:fstream", "all:bird", "body:flies",
              "title:fstream body:loud", "all:fox"]:
        a = [(d, round(s, 9)) for d, s in rebuilt.search(q, k=10)]
        b = [(d, round(s, 9)) for d, s in seg.search(q, k=10)]
        assert a == b, (q, a, b)
    assert seg.get_document(0) is None
    assert seg.get_document(3)["title"] == "fstream renamed"

    # replay safety: re-running with no new files changes nothing
    run_stream()
    assert ingest.fielded_stream_head(root) == head

    # the fielded checker trusts the head tree
    assert lc.check_fielded_segments(spark, head)["ok"]
