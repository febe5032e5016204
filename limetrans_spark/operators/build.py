"""Index build: corpus table → docstore + postings + stats + compressed shards.

Replaces the reference's transform→Elasticsearch-bulk path
(``main/src/main/java/hbz/limetrans/Limetrans.java:431-501``,
``ElasticsearchIndexer.java:88-164``) with an explicit SPIMI-style build:

  corpus (repo, path, commit, lang, content)
    → deterministic dense doc IDs          (no global sort at scale)
    → vectorized graph tokenization        (functions/analysis.py)
    → (term, doc_id) partial-agg tf        (Catalyst map-side combine)
    → doc-sharded, term-sorted runs        (one shuffle)
    → delta-gap + varint block compression (operators/codec.py, SPIMI writer)
    → global DF / N / avgdl statistics

Scale decisions (the 100 TB story):

* **Doc-sharding bounds skew structurally.** High-DF terms (license
  boilerplate, ``if``/``return``) would make ``groupBy(term)`` +
  ``collect_list`` explode one reducer key.  Instead the index is
  partitioned by ``shard = doc_id // shard_size``: a term's postings are
  split across shards, so no reducer ever sees more than ``shard_size``
  postings per term.  This is the explicit salting/repartitioning the
  north rule demands, and it is also the right *query* layout: each shard
  answers top-k locally (block-max WAND) and only k rows per shard merge
  globally.
* **Deterministic IDs without a global sort.** ``assign_doc_ids`` buckets
  rows by an md5 hash of the natural key into a fixed number of buckets
  (independent of cluster size), sorts within bucket, and adds exact
  bucket-offset prefix sums.  Result: dense 0..N-1 IDs, identical at any
  parallelism — the rank-identity precondition.  (``mode="sort"`` gives
  the FIXTURES.md dense-rank-over-sorted-keys order via range bucketing;
  rank = #keys below, which is invariant to sampled range boundaries.)
* **Two aggregation passes, both partial-agg friendly**: tf per
  ``(term, doc)`` (huge key space, no skew) and df per term (one row per
  reducer key after map-side combine).

Reference parity anchors: deterministic record IDs
(``Limetrans.java:572-584`` RecordIdChanger), build counters
(``ElasticsearchClient.java:427-449``), per-row sha256 invariant
(BASELINE.json; analogue of the reference's golden byte-equality tests,
``AbstractTransformationTest.java:80-83``).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analysis import code_tokens_udf, invert_py, simple_tokens
from . import codec

DEFAULT_SHARD_SIZE = 1 << 17  # docs per shard; ~1M+ in prod, small here
DEFAULT_ID_BUCKETS = 64  # fixed, cluster-size independent

BM25_K1 = 1.2
BM25_B = 0.75


# --------------------------------------------------------------------------
# doc id assignment
# --------------------------------------------------------------------------


def assign_doc_ids(
    df: DataFrame,
    keys: tuple[str, ...] = ("repo", "path", "commit"),
    mode: str = "hash",
    num_buckets: int = DEFAULT_ID_BUCKETS,
) -> DataFrame:
    """Add a dense, deterministic ``doc_id`` (0..N-1) column.

    ``mode="hash"``: bucket by md5(key) (fixed ``num_buckets``), sort by
    key within bucket, add exact bucket-offset prefix sums.  One shuffle,
    no global sort, IDs invariant to cluster size.  Size ``num_buckets``
    so a bucket's rows fit one task's sort comfortably (~1–10M keys per
    bucket; e.g. 10^12 docs → ~10^5–10^6 buckets).  The value is part of
    the ID assignment, so pin it per corpus — changing it renumbers.

    ``mode="sort"``: IDs equal the global dense rank of ``keys`` ascending
    (FIXTURES.md §1) via range bucketing; invariant for distinct keys.
    """
    key_expr = F.concat_ws("\x1f", *[F.col(k) for k in keys])
    if mode == "hash":
        bucket = (
            F.conv(F.substring(F.md5(key_expr), 1, 8), 16, 10).cast("long")
            % num_buckets
        ).cast("int")
        df_b = df.withColumn("_bucket", bucket)
    elif mode == "sort":
        df_b = (
            df.repartitionByRange(num_buckets, *keys)
            .withColumn("_bucket", F.spark_partition_id())
        )
    else:
        raise ValueError(mode)

    counts = {
        r["_bucket"]: r["cnt"]
        for r in df_b.groupBy("_bucket").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(b, o) for b, o in offsets.items()], "_bucket int, _offset long"
        )
    )
    w = Window.partitionBy("_bucket").orderBy(*keys)
    return (
        df_b.withColumn("_local", F.row_number().over(w) - 1)
        .join(off_df, "_bucket")
        .withColumn("doc_id", (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_bucket", "_local", "_offset")
    )


# --------------------------------------------------------------------------
# tokenize + flat postings + stats
# --------------------------------------------------------------------------


def tokenize(docs: DataFrame, text_col: str = "content", analyzer: str = "code") -> DataFrame:
    """→ (doc_id, term, pos) exploded token stream."""
    if analyzer == "code":
        toks = docs.select(
            "doc_id", F.explode(code_tokens_udf(F.col(text_col))).alias("tok")
        )
        return toks.select("doc_id", F.col("tok.term").alias("term"), F.col("tok.pos").alias("pos"))
    if analyzer == "simple":
        toks = docs.select(
            "doc_id",
            F.posexplode(simple_tokens(F.col(text_col))).alias("pos", "term"),
        )
        return toks.select("doc_id", "term", F.col("pos").cast("int"))
    if analyzer == "simple_stop":
        # stop filter (hbztitle-settings-v8.json:66-122): pure Catalyst,
        # survivors keep pre-filter positions (phrase gaps stay real)
        from ..functions.analysis import stop_tokens

        toks = docs.select(
            "doc_id", F.explode(stop_tokens(F.col(text_col))).alias("tok")
        )
        return toks.select(
            "doc_id", F.col("tok.term").alias("term"), F.col("tok.pos").alias("pos")
        )
    if analyzer in ("simple_stem", "simple_stem_de", "simple_stop_stem_de"):
        # keyword_repeat shape: surface token + (if different) its stem
        # at one position; the *_de variants stem with snowball German2
        # and simple_stop_stem_de drops stopwords first (positions kept)
        @F.pandas_udf("array<struct<term:string,pos:int>>")
        def stem_toks(texts: pd.Series) -> pd.Series:
            from ..functions.analysis import (
                simple_tokenize_py,
                stop_tokenize_with_pos_py,
            )

            if analyzer == "simple_stem":
                from ..functions.stem import porter_stem as stem_fn
            else:
                from ..functions.stem_de import german2_stem as stem_fn

            def one(t):
                if analyzer == "simple_stop_stem_de":
                    pairs = stop_tokenize_with_pos_py(t or "")
                else:
                    pairs = list(enumerate(simple_tokenize_py(t or "")))
                    pairs = [(tok, i) for i, tok in pairs]
                out = []
                for tok, i in pairs:
                    out.append((tok, i))
                    st = stem_fn(tok)
                    if st != tok:
                        out.append((st, i))
                return out

            return texts.map(one)

        toks = docs.select("doc_id", F.explode(stem_toks(F.col(text_col))).alias("tok"))
        return toks.select("doc_id", F.col("tok.term").alias("term"), F.col("tok.pos").alias("pos"))
    raise ValueError(analyzer)


def flat_postings(tokens: DataFrame, with_positions: bool = True) -> DataFrame:
    """(term, doc_id) → tf [+ sorted positions]. Partial-agg friendly.

    NOTE: kept for the streaming delta path; the batch build uses
    :func:`invert_docs` instead — a ``(term, doc)`` collect_list
    aggregation over the exploded token stream degenerates to sort-based
    spilling under ObjectHashAggregate's key-count fallback and stops
    scaling past ~8 cores (measured 4× slow-down at 32)."""
    aggs = [F.count("*").cast("int").alias("tf")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return tokens.groupBy("term", "doc_id").agg(*aggs)


INVERT_SCHEMA = (
    "doc_id long, dl long, "
    "postings array<struct<term:string,tf:int,pos_blob:binary>>"
)


def invert_docs(
    docs: DataFrame,
    text_col: str = "content",
    analyzer: str = "code",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Map-side document inversion (the SPIMI mapper): one Arrow pass
    computes, per document, its length and its sorted (term, tf,
    pos_blob) fragments — positions leave the mapper ALREADY delta-gap
    varint encoded (one vectorized pass per Arrow batch), so downstream
    stages shuffle compact binary instead of int arrays and the block
    writer just concatenates bytes.  No shuffle here — raw tokens never
    leave the task that tokenized them.

    ``passthrough`` columns ride along unchanged, so the docstore can be
    projected straight off the inverted cache instead of re-joining the
    corpus by doc_id afterwards (at 100 TB that join is a full-corpus
    shuffle; here it's zero extra cost — the Arrow batch already holds
    the row)."""
    passthrough = tuple(dict.fromkeys(c for c in passthrough if c != "doc_id"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            inv = [invert_py(t, analyzer) for t in pdf[text_col]]
            # batch-vectorized positional encoding across ALL postings
            flat: list[int] = []
            lens: list[int] = []
            for _, posting_list in inv:
                for _, _, ps in posting_list:
                    flat.extend(ps)
                    lens.append(len(ps))
            blobs = codec.encode_positions_grouped(
                np.asarray(flat, dtype=np.int64), np.asarray(lens, dtype=np.int64)
            )
            rows = []
            i = 0
            for _, posting_list in inv:
                out = []
                for term, tf, _ in posting_list:
                    out.append((term, tf, blobs[i]))
                    i += 1
                rows.append(out)
            cols = {
                "doc_id": pdf["doc_id"],
                "dl": [d for d, _ in inv],
                "postings": rows,
            }
            for c in passthrough:
                cols[c] = pdf[c]
            yield pd.DataFrame(cols)

    schema = INVERT_SCHEMA
    if passthrough:
        extra = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in docs.schema.fields
            if f.name in passthrough
        )
        schema = f"{INVERT_SCHEMA}, {extra}"
    sel_extra = [c for c in passthrough if c != text_col]
    return docs.select("doc_id", text_col, *sel_extra).mapInPandas(fn, schema)


def explode_postings(inverted: DataFrame, keep_dl: bool = False) -> DataFrame:
    """Nested per-doc fragments → flat (term, doc_id, tf, pos_blob[, dl]).
    Narrow (no shuffle); backed by the inverted cache."""
    cols = [
        F.col("p.term").alias("term"),
        F.col("doc_id"),
        F.col("p.tf").alias("tf"),
        F.col("p.pos_blob").alias("pos_blob"),
    ]
    if keep_dl:
        cols.append(F.col("dl"))
    return inverted.select("doc_id", "dl", F.explode("postings").alias("p")).select(*cols)


def doc_lengths(tokens: DataFrame) -> DataFrame:
    """doc_id → dl = #distinct position slots: graph overlap tokens
    (posInc 0) are discounted AND stop-filter gaps don't count (Lucene
    length norm = tokens emitted by the chain).  ``max(pos)+1`` would be
    cheaper but overcounts under ``simple_stop``, whose survivors keep
    their pre-filter positions."""
    return tokens.groupBy("doc_id").agg(
        F.count_distinct("pos").cast("long").alias("dl")
    )


def doc_lengths_from_postings(postings: DataFrame) -> DataFrame:
    """dl = Σ tf — valid ONLY for analyzers without overlap tokens (the
    ``simple`` analyzer); saves a full tokenize pass + shuffle."""
    return postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))


def doc_lengths_from_dl_column(postings_with_dl: DataFrame) -> DataFrame:
    """doc_id → dl from flat postings that carry the per-doc ``dl``
    column (explode_postings(keep_dl=True)); overlap-correct for any
    analyzer because dl was computed at inversion time."""
    return postings_with_dl.groupBy("doc_id").agg(
        F.max("dl").cast("long").alias("dl")
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """term → df (doc count), cf (collection tf), max_tf (WAND global
    bound), tlen (term length — STORED so a fuzzy query's length band is
    a plain pushed column predicate on the terms parquet instead of a
    computed expression over every dictionary row)."""
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.max("tf").cast("int").alias("max_tf"),
    ).withColumn("tlen", F.length("term").cast("int"))


def deep_check_shards(shards: DataFrame, shard_size: int) -> dict:
    """Decode EVERY compressed posting run in the serving artifact and
    validate the codec invariants — the deep half of the Lucene-style
    checkIndex (the flat-postings cross-check proves the STATISTICS;
    this proves the BYTES the serving tier actually reads).  Per
    (shard, term) run: varint streams consume exactly ``n`` (doc) /
    ``n`` (tf) / ``Σtf`` (positions) values with no trailing garbage
    (a varint's last byte has the high bit clear, so complete-value
    count == count of bytes < 0x80), doc ids strictly increasing inside
    ``[shard·S, (shard+1)·S)``, tf ≥ 1 with ``Σtf == sum_tf``, skip
    pointers ``block_last`` / ``block_max_tf`` equal a recomputation
    from the decoded arrays, and per-doc positions non-negative and
    strictly increasing.  One distributed column-complete scan; the
    Python loop is per RUN (vectorized NumPy inside), the same
    accounting as the SPIMI writer itself.  Returns
    ``{rows, postings, violations, first_bad}``."""
    BS = codec.BLOCK_SIZE

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = len(pdf)
            posts = 0
            bad = 0
            first_bad = None
            for t in pdf.itertuples(index=False):
                ok = True
                try:
                    n = int(t.n)
                    shard = int(t.shard)
                    db, tb = bytes(t.doc_blob), bytes(t.tf_blob)
                    docs, tfs = codec.decode_postings(
                        db, tb, n, base=shard * shard_size
                    )
                    posts += n
                    lo, hi = shard * shard_size, (shard + 1) * shard_size
                    ok = (
                        n > 0
                        and int(np.count_nonzero(np.frombuffer(db, np.uint8) < 128)) == n
                        and int(np.count_nonzero(np.frombuffer(tb, np.uint8) < 128)) == n
                        and bool((tfs >= 1).all())
                        and bool((np.diff(docs) > 0).all())
                        and lo <= int(docs[0])
                        and int(docs[-1]) < hi
                        and int(tfs.sum()) == int(t.sum_tf)
                    )
                    if ok:
                        nb = (n + BS - 1) // BS
                        idx = np.minimum(np.arange(1, nb + 1) * BS, n) - 1
                        ok = np.array_equal(
                            np.asarray(t.block_last, dtype=np.int64), docs[idx]
                        ) and np.array_equal(
                            np.asarray(t.block_max_tf, dtype=np.int64),
                            np.maximum.reduceat(tfs, np.arange(0, n, BS)),
                        )
                    pb = bytes(t.pos_blob) if t.pos_blob is not None else b""
                    if ok and pb:
                        flat = np.concatenate(codec.decode_positions(pb, tfs))
                        heads = np.cumsum(tfs) - tfs
                        mask = np.ones(flat.size, dtype=bool)
                        mask[heads] = False
                        d = np.diff(flat)
                        ok = (
                            bool((flat >= 0).all())
                            and bool((d[mask[1:]] > 0).all())
                            and int(
                                np.count_nonzero(np.frombuffer(pb, np.uint8) < 128)
                            ) == int(tfs.sum())
                        )
                except Exception:
                    ok = False
                if not ok:
                    bad += 1
                    if first_bad is None:
                        first_bad = f"shard={t.shard} term={t.term}"
            yield pd.DataFrame(
                {
                    "rows": [rows],
                    "postings": [posts],
                    "violations": [bad],
                    "first_bad": [first_bad],
                }
            )

    agg = (
        shards.mapInPandas(
            scan, "rows long, postings long, violations long, first_bad string"
        )
        .agg(
            F.sum("rows").alias("rows"),
            F.sum("postings").alias("postings"),
            F.sum("violations").alias("violations"),
            F.max("first_bad").alias("first_bad"),
        )
        .collect()[0]
    )
    return {
        "rows": int(agg["rows"] or 0),
        "postings": int(agg["postings"] or 0),
        "violations": int(agg["violations"] or 0),
        "first_bad": agg["first_bad"],
    }


def skew_report(terms: DataFrame, n_docs: int, top: int = 20) -> list[dict]:
    """Top-DF terms + corpus share — the skew telemetry the north rule
    asks for (stopword-like code tokens, license boilerplate).  These are
    the terms whose postings the doc-shard layout splits across shards;
    the report goes into the build manifest (save_index)."""
    rows = (
        terms.orderBy(F.col("df").desc(), "term")
        .limit(top)
        .select("term", "df", "cf")
        .collect()
    )
    return [
        {
            "term": r["term"],
            "df": int(r["df"]),
            "cf": int(r["cf"]),
            "doc_share": round(r["df"] / n_docs, 4) if n_docs else 0.0,
        }
        for r in rows
    ]


def corpus_stats(doclens: DataFrame) -> tuple[int, float]:
    """(n_docs, avgdl) with avgdl = exact int64 sum / count, divided once
    in Python: float avg() sums partials in partition order, and a 1-ulp
    avgdl difference would silently break bit-identical ranks across
    cluster sizes (dl is integral, so the sum is exact)."""
    row = doclens.agg(
        F.count("*").alias("n"), F.sum("dl").alias("dl_sum")
    ).collect()[0]
    n = int(row["n"])
    return n, (int(row["dl_sum"]) / n if n else 0.0)


def invert_token_stream(toks: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """EXPLICIT (doc_id, term, pos) token stream → flat positional
    postings (term, doc_id, tf, pos_blob) + per-doc dl, WITHOUT a
    collect_list aggregation (whose ObjectHashAggregate fallback stops
    scaling at high (term,doc) cardinality — measured in round 1).

    One range-partition shuffle by (doc_id, term) co-locates and orders
    each posting's positions; a streaming Arrow pass then emits one row
    per (doc_id, term) run with the positions already delta-gap varint
    encoded, plus dl = #distinct position slots per doc (overlap tokens
    at one slot count once; COPY_GAP offsets don't inflate dl).  Output
    column ``dl`` rides every posting row (the
    :func:`doc_lengths_from_dl_column` convention).  Duplicate
    (doc_id, term, pos) triples in the input collapse to one occurrence
    (the operation is idempotent — our analyzers never emit duplicates,
    but user-composed streams might).
    """

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur: tuple[int, str] | None = None
        poss: list[np.ndarray] = []
        # per-doc distinct-slot accounting spans term runs of one doc
        cur_doc: int | None = None
        doc_rows: list[dict] = []
        doc_slots: set[int] = set()

        def flush_run():
            p = np.unique(np.concatenate(poss))
            blob = codec.varint_encode(codec.delta_encode(p, 0))
            doc_rows.append(
                {"term": cur[1], "doc_id": cur[0], "tf": int(p.size), "pos_blob": blob}
            )
            doc_slots.update(p.tolist())

        def flush_doc():
            dl = len(doc_slots)
            for r in doc_rows:
                r["dl"] = dl
                yield r

        for pdf in batches:
            if pdf.empty:
                continue
            out: list[dict] = []
            docs_arr = pdf["doc_id"].to_numpy()
            terms_arr = pdf["term"].to_numpy()
            pos_arr = pdf["pos"].to_numpy(dtype=np.int64)
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            change[1:] = (docs_arr[1:] != docs_arr[:-1]) | (terms_arr[1:] != terms_arr[:-1])
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], len(pdf))
            for s, e in zip(starts, ends):
                key = (int(docs_arr[s]), str(terms_arr[s]))
                if key != cur:
                    if cur is not None:
                        flush_run()
                    if key[0] != cur_doc:
                        if cur_doc is not None:
                            out.extend(flush_doc())
                        cur_doc, doc_rows, doc_slots = key[0], [], set()
                    cur, poss = key, []
                poss.append(pos_arr[s:e])
            if out:
                yield pd.DataFrame(out)
        if cur is not None:
            flush_run()
            yield pd.DataFrame(list(flush_doc()))

    n_parts = num_partitions or toks.sparkSession.conf.get("spark.sql.shuffle.partitions")
    # range-partition by doc_id ONLY: a document's rows must be
    # co-located for the distinct-slot dl accounting (a (doc_id, term)
    # range could split one doc across partitions); per-doc row counts
    # are bounded by document size, so no skew pivot
    return (
        toks.repartitionByRange(int(n_parts), "doc_id")
        .sortWithinPartitions("doc_id", "term", "pos")
        .mapInPandas(write, "term string, doc_id long, tf int, pos_blob binary, dl long")
    )


def build_index_from_tokens(
    toks: DataFrame,
    shard_size: int = DEFAULT_SHARD_SIZE,
    analyzer_label: str = "pretokenized",
) -> BuiltIndex:
    """Full compressed index from an explicit (doc_id, term, pos) token
    stream — for callers that COMPOSE their stream rather than own a
    text column (the fielded tier's copy_to targets union
    position-gapped source streams here, so cross-source phrases stay
    unsatisfiable in the compressed positional payloads too — identical
    semantics to the DataFrame tier's COPY_GAP).

    Same artifacts and invariants as :func:`build_index` (tf counts
    every occurrence incl. overlap tokens at one slot; dl counts
    distinct slots; exact int64 avgdl)."""
    with_dl = invert_token_stream(toks).persist()
    postings = with_dl.drop("dl")
    doclens = (
        with_dl.groupBy("doc_id").agg(F.max("dl").cast("long").alias("dl"))
        .filter(F.col("dl") > 0)
        .persist()
    )
    n_docs, avgdl = corpus_stats(doclens)
    return BuiltIndex(
        docstore=doclens.select("doc_id", "dl"),
        postings=postings,
        shards=build_shards(postings, shard_size=shard_size),
        terms=term_stats(postings),
        doclens=doclens,
        n_docs=n_docs,
        avgdl=avgdl,
        shard_size=shard_size,
        metrics={"n_docs": n_docs, "avgdl": avgdl, "analyzer": analyzer_label,
                 "shard_size": shard_size, "from_tokens": True},
        shard_dl=build_shard_doclens(doclens, shard_size),
    )


# --------------------------------------------------------------------------
# compressed, doc-sharded index (SPIMI writer)
# --------------------------------------------------------------------------

SHARD_ROW_SCHEMA = (
    "shard int, term string, n int, "
    "doc_blob binary, tf_blob binary, pos_blob binary, "
    "block_last array<long>, block_max_tf array<int>, sum_tf long"
)


def _varint_buffer(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Varint-encode a whole batch in ONE vectorized pass → (buffer,
    per-value byte offsets).  Slicing the buffer at value boundaries is
    byte-identical to per-run ``varint_encode`` (varint byte boundaries
    align per value)."""
    v = np.asarray(vals, dtype=np.uint64)
    buf = codec.varint_encode(v)
    ofs = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(codec._varint_nbytes(v), out=ofs[1:])
    return buf, ofs


def _spimi_writer(shard_size: int):
    """mapInArrow fn: term-sorted (shard, term, doc_id, tf, pos_blob)
    rows → one compressed row per (shard, term) run.

    Arrow-native end to end: the earlier mapInPandas writers spent the
    1M-doc build's dominant 36-39 s materializing ~48 M Python objects
    at the UDF boundary (term strings + pos bytes on the way in, per-run
    blob bytes + dict rows on the way out — BENCH/BASELINE.md round-5
    build profile).  Here run boundaries come from a C++ ``not_equal``
    over the Arrow string column, doc gaps / tfs are varint-encoded in
    ONE vectorized pass per batch and the per-run blobs are Arrow
    ``BinaryArray.from_buffers`` views over that single buffer (runs
    tile the batch, so the value-offset gather IS the run layout); the
    positional payload reuses the INPUT binary column's data buffer the
    same way — no per-posting or per-run Python object is ever created.
    Block metadata (skip pointers + block-max tf) falls out of two
    ``np.*.reduceat`` calls over the contiguous block tiling.

    Runs may span Arrow batches; the trailing run of each batch is
    carried into the next, so memory stays bounded by the largest
    single (shard, term) run, itself bounded by ``shard_size``.
    Output rows are byte-identical to per-run ``codec.encode_postings``
    (pinned by tests/test_build.py).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    BS = codec.BLOCK_SIZE

    def _bin_col(data, ofs64: np.ndarray) -> "pa.BinaryArray":
        return pa.BinaryArray.from_buffers(
            pa.binary(), ofs64.size - 1,
            [None, pa.py_buffer(ofs64.astype(np.int32)), pa.py_buffer(data)],
        )

    def encode(tbl: "pa.Table", starts: np.ndarray, sh: np.ndarray,
               doc: np.ndarray, tf: np.ndarray) -> "pa.RecordBatch":
        lastn = doc.size
        ends = np.append(starts[1:], lastn)
        lens = ends - starts
        nruns = starts.size
        # doc gaps, restarting each run at delta-from-shard-base
        gaps = doc.copy()
        gaps[1:] -= doc[:-1]
        gaps[starts] = doc[starts] - sh[starts] * shard_size
        doc_buf, doc_ofs = _varint_buffer(gaps)
        tf_buf, tf_ofs = _varint_buffer(tf)
        run_edges = np.append(starts, lastn)
        doc_col = _bin_col(doc_buf, doc_ofs[run_edges])
        tf_col = _bin_col(tf_buf, tf_ofs[run_edges])
        # block metadata: blocks tile each run contiguously, so block
        # starts are strictly increasing across the whole batch and one
        # reduceat per reduction covers every block of every run
        nblocks = (lens + BS - 1) // BS
        bcum = np.cumsum(nblocks)
        bord = np.arange(int(bcum[-1])) - np.repeat(bcum - nblocks, nblocks)
        run_of_block = np.repeat(np.arange(nruns), nblocks)
        bstart = starts[run_of_block] + bord * BS
        bend = np.minimum(bstart + BS, ends[run_of_block])
        lofs = pa.array(np.concatenate(([0], bcum)).astype(np.int32))
        bl_col = pa.ListArray.from_arrays(
            lofs, pa.array(doc[bend - 1], type=pa.int64())
        )
        bm_col = pa.ListArray.from_arrays(
            lofs,
            pa.array(np.maximum.reduceat(tf, bstart).astype(np.int32)),
        )
        # positions: reuse the input column's data buffer — runs are
        # contiguous row ranges, so their bytes are contiguous too and
        # the output offsets are a pure gather of the input offsets
        parr = tbl.column("pos_blob").chunk(0)
        po = np.frombuffer(parr.buffers()[1], dtype=np.int32)[
            parr.offset : parr.offset + len(parr) + 1
        ].astype(np.int64)
        dbuf = parr.buffers()[2]  # None when every value is b""
        pdata = (
            np.frombuffer(dbuf, dtype=np.uint8)
            if dbuf is not None
            else np.zeros(0, dtype=np.uint8)
        )
        base0 = int(po[0])
        pos_col = _bin_col(
            pdata[base0 : int(po[lastn])], po[run_edges] - base0
        )
        term_col = tbl.column("term").chunk(0).take(pa.array(starts))
        return pa.RecordBatch.from_arrays(
            [
                pa.array(sh[starts].astype(np.int32)),
                term_col,
                pa.array(lens.astype(np.int32)),
                doc_col,
                tf_col,
                pos_col,
                bl_col,
                bm_col,
                pa.array(np.add.reduceat(tf, starts).astype(np.int64)),
            ],
            names=[
                "shard", "term", "n", "doc_blob", "tf_blob", "pos_blob",
                "block_last", "block_max_tf", "sum_tf",
            ],
        )

    def write(batches):
        carry = None  # pa.Table holding the trailing (shard, term) run
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl])
                carry = None
            tbl = tbl.combine_chunks()
            n = tbl.num_rows
            if n == 0:
                continue
            sh = tbl.column("shard").chunk(0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            term = tbl.column("term").chunk(0)
            change = np.empty(n, dtype=bool)
            change[0] = True
            if n > 1:
                change[1:] = sh[1:] != sh[:-1]
                change[1:] |= pc.not_equal(
                    term.slice(1), term.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
            starts = np.nonzero(change)[0]
            last = int(starts[-1])
            if last == 0:  # whole batch is one run — keep accumulating
                carry = tbl
                continue
            carry = tbl.slice(last)
            doc = tbl.column("doc_id").chunk(0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            tf = tbl.column("tf").chunk(0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            yield encode(tbl, starts[:-1], sh[:last], doc[:last], tf[:last])
        if carry is not None and carry.num_rows:
            tbl = carry.combine_chunks()
            sh = tbl.column("shard").chunk(0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            doc = tbl.column("doc_id").chunk(0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            tf = tbl.column("tf").chunk(0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            yield encode(tbl, np.zeros(1, dtype=np.int64), sh, doc, tf)

    return write


def build_shards(
    postings: DataFrame,
    shard_size: int = DEFAULT_SHARD_SIZE,
    num_partitions: int | None = None,
) -> DataFrame:
    """Flat postings → compressed doc-sharded index rows.

    One shuffle: repartition by shard (all of a shard's postings are
    co-located so queries touch exactly the partitions holding their
    shards), then a partition-local sort by (shard, term, doc_id) feeds
    the streaming SPIMI writer.  Output parquet written sorted by term
    within each shard → parquet row-group min/max stats prune term
    lookups without any custom index structure.
    """
    p = postings.withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int")
    )
    if "pos_blob" not in p.columns:
        p = p.withColumn("pos_blob", F.lit(b""))
    if "dl" in p.columns:
        p = p.drop("dl")
    n_parts = num_partitions or p.sparkSession.conf.get("spark.sql.shuffle.partitions")
    # RANGE-partition by (shard, term): keeps every (shard, term) run intact
    # (identical keys never straddle a range boundary) while spreading a
    # shard's terms over all cores — full parallelism even when
    # n_shards < n_cores, no reducer holds more than one term-run of one
    # shard, AND the output is globally sorted by (shard, term), so at
    # production file sizes every parquet ROW GROUP covers a narrow
    # (shard, term) slice — pushed term predicates (verified:
    # PushedFilters [In(term, …)]) skip row groups instead of decoding
    # them.  Term can't lead the sort: all shards of one stop-like term
    # would land in one reducer — exactly the skew sharding exists to
    # break.  Hot high-DF runs stay ≤ shard_size rows per reducer.
    return (
        p.repartitionByRange(int(n_parts), "shard", "term")
        .sortWithinPartitions("shard", "term", "doc_id")
        .mapInArrow(_spimi_writer(shard_size), SHARD_ROW_SCHEMA)
    )


def build_shards_docwise(
    inverted: DataFrame,
    shard_size: int = DEFAULT_SHARD_SIZE,
    num_partitions: int | None = None,
    with_positions: bool = True,
) -> DataFrame:
    """Doc-wise shards strategy: shuffle ONE row per document, sort in C.

    :func:`build_shards` explodes postings BEFORE the shuffle, so the
    range shuffle and the JVM sort both handle one row per posting
    (~50 rows per doc) — measured as the dominant build stage at 1M
    docs even after the Arrow writer rewrite.  But every posting of a
    document lands in the same shard (shard = doc_id / shard_size), so
    the shuffle only ever needs to MOVE documents; the posting-level
    order can be recovered after routing.  This variant hash-partitions
    the inverted rows by shard (48× fewer shuffle rows at ~50
    postings/doc), sorts (shard, doc_id) JVM-side — cheap at doc
    granularity — and then, per shard, flattens the postings lists and
    sorts (term, doc_id) with Arrow's C kernels before handing the
    SORTED stream to the same :func:`_spimi_writer`.  Output is
    byte-identical to :func:`build_shards` (pinned by
    tests/test_build.py): per (shard, term) the same doc-ordered run,
    one output row per run (whole shards never straddle partitions
    under hash partitioning).

    Tradeoffs vs :func:`build_shards` — this is NOT a drop-in default:

    * memory is O(one shard's postings) per task (the C sort needs the
      whole shard), not O(1) streaming — callers must keep
      ``shard_size × avgdl`` Arrow-resident-friendly (:func:`build_index`
      guards on it);
    * parallelism is ≥1 whole shard per task, so it needs
      n_shards >> cores (small corpora keep the range strategy, which
      splits one shard's terms across every core).

    Measured (BENCH/BASELINE.md, 1M docs / 123 shards / local[32]):
    37 → 8–14 s for the shards stage, byte-equal content hash.
    """
    import pyarrow as pa

    inner = _spimi_writer(shard_size)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        import pyarrow.compute as pc

        def _empty_bin(n: int) -> "pa.BinaryArray":
            return pa.BinaryArray.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(np.zeros(n + 1, dtype=np.int32)),
                 pa.py_buffer(b"")],
            )

        def flatten_sort(doc_np: np.ndarray, plist: "pa.ListArray") -> "pa.RecordBatch":
            # one whole shard: flatten the postings lists (C), recover
            # (term, doc_id) order with Arrow's C sort — the key is
            # unique per shard, so stability is irrelevant
            lens = plist.value_lengths().to_numpy(zero_copy_only=False)
            vals = plist.flatten()
            doc_rep = np.repeat(doc_np, lens)
            shard = np.full(doc_rep.size, int(doc_np[0]) // shard_size, np.int32)
            term = vals.field("term")
            idx = pc.sort_indices(
                pa.table({"term": term, "doc_id": pa.array(doc_rep, pa.int64())}),
                sort_keys=[("term", "ascending"), ("doc_id", "ascending")],
            )
            pos = (
                vals.field("pos_blob").take(idx)
                if with_positions
                else _empty_bin(doc_rep.size)
            )
            return pa.record_batch(
                [
                    pa.array(shard),
                    term.take(idx),
                    pa.array(doc_rep, pa.int64()).take(idx),
                    vals.field("tf").take(idx),
                    pos,
                ],
                names=["shard", "term", "doc_id", "tf", "pos_blob"],
            )

        def shard_groups() -> Iterator["pa.RecordBatch"]:
            # rows arrive sorted by (shard, doc_id); a shard may span
            # Arrow batches, so carry its slices until the shard changes
            acc: list[tuple[np.ndarray, "pa.ListArray"]] = []
            cur: int | None = None
            first = True
            for rb in batches:
                tbl = pa.Table.from_batches([rb]).combine_chunks()
                if tbl.num_rows == 0:
                    continue
                doc = tbl.column("doc_id").chunk(0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                if first:
                    first = False
                    # rows arrive doc_id-sorted, so doc[0] is the
                    # partition minimum: negative ids would make the SQL
                    # routing (truncating division) and the floor
                    # division here disagree and silently split a shard
                    if doc[0] < 0:
                        raise ValueError(
                            "build_shards_docwise requires non-negative "
                            "doc_id (dense ids from assign_doc_ids)"
                        )
                sh = doc // shard_size
                change = np.nonzero(np.diff(sh))[0] + 1
                bounds = np.concatenate(([0], change, [doc.size]))
                pl = tbl.column("postings").chunk(0)
                for a, b in zip(bounds[:-1], bounds[1:]):
                    s = int(sh[a])
                    if cur is not None and s != cur:
                        yield merge_group(acc)
                        acc = []
                    cur = s
                    acc.append((doc[a:b], pl.slice(int(a), int(b - a))))
            if acc:
                yield merge_group(acc)

        def merge_group(
            acc: list[tuple[np.ndarray, "pa.ListArray"]]
        ) -> "pa.RecordBatch":
            if len(acc) == 1:
                return flatten_sort(*acc[0])
            return flatten_sort(
                np.concatenate([d for d, _ in acc]),
                pa.concat_arrays([p for _, p in acc]),
            )

        yield from inner(shard_groups())

    n_parts = num_partitions or inverted.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return (
        inverted.select(
            "doc_id",
            "postings",
            (F.col("doc_id") / F.lit(shard_size)).cast("int").alias("shard"),
        )
        .repartition(int(n_parts), "shard")
        .sortWithinPartitions("shard", "doc_id")
        .drop("shard")
        .mapInArrow(fn, SHARD_ROW_SCHEMA)
    )


# a task buffers one whole shard's postings on the docwise path; keep
# that comfortably Arrow-resident (≈ a few hundred MB at 8-byte order)
DOCWISE_MAX_SHARD_POSTINGS = 64_000_000


def choose_shards_strategy(
    n_docs: int, avgdl: float, shard_size: int, num_partitions: int
) -> str:
    """'docwise' when every task gets ≥2 whole shards AND a shard's
    postings fit task memory; else the streaming 'range' strategy."""
    n_shards = (n_docs + shard_size - 1) // shard_size if shard_size else 0
    if (
        n_shards >= 2 * num_partitions
        and shard_size * max(avgdl, 1.0) <= DOCWISE_MAX_SHARD_POSTINGS
    ):
        return "docwise"
    return "range"


SHARD_DL_SCHEMA = "shard int, n int, doc_blob binary, dl_blob binary"


def build_shard_doclens(
    doclens: DataFrame, shard_size: int, num_partitions: int | None = None
) -> DataFrame:
    """doclens → one compressed row per shard: (shard, n, doc_blob, dl_blob).

    Queries need per-candidate document lengths; shuffling the whole
    doclens table per query (O(corpus) — what the naive cogroup does)
    cannot scale.  This materializes each shard's (doc_id, dl) pairs as
    two varint blobs ONCE at build; at query time the dl side of the
    cogroup is a single small row per shard."""

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur: int | None = None
        ids: list[np.ndarray] = []
        dls: list[np.ndarray] = []

        def flush() -> dict:
            d = np.concatenate(ids)
            v = np.concatenate(dls)
            base = cur * shard_size
            return {
                "shard": cur,
                "n": int(d.size),
                "doc_blob": codec.varint_encode(codec.delta_encode(d, base)),
                "dl_blob": codec.varint_encode(v),
            }

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            sh = pdf["shard"].to_numpy()
            di = pdf["doc_id"].to_numpy()
            dv = pdf["dl"].to_numpy()
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            change[1:] = sh[1:] != sh[:-1]
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], len(pdf))
            for s, e in zip(starts, ends):
                k = int(sh[s])
                if k != cur:
                    if cur is not None:
                        out.append(flush())
                    cur, ids, dls = k, [], []
                ids.append(di[s:e])
                dls.append(dv[s:e])
            if out:
                yield pd.DataFrame(out)
        if cur is not None:
            yield pd.DataFrame([flush()])

    n_parts = num_partitions or doclens.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        doclens.withColumn("shard", (F.col("doc_id") / F.lit(shard_size)).cast("int"))
        .repartitionByRange(int(n_parts), "shard")
        .sortWithinPartitions("shard", "doc_id")
        .mapInPandas(write, SHARD_DL_SCHEMA)
    )


# --------------------------------------------------------------------------
# full build
# --------------------------------------------------------------------------


@dataclass
class BuiltIndex:
    docstore: DataFrame
    postings: DataFrame  # flat (term, doc_id, tf[, pos_blob])
    shards: DataFrame  # compressed posting runs
    terms: DataFrame  # term → df, cf, max_tf
    doclens: DataFrame
    n_docs: int
    avgdl: float
    shard_size: int
    metrics: dict
    shard_dl: DataFrame | None = None  # (shard, n, doc_blob, dl_blob)
    # process-unique identity for per-index caches (query._IDF_CACHE):
    # id(self) recycles after GC and can alias a stale cache entry
    uid: int = field(default_factory=itertools.count().__next__)

    def shard_doclens(self) -> DataFrame:
        if self.shard_dl is None:
            self.shard_dl = build_shard_doclens(self.doclens, self.shard_size)
        return self.shard_dl

    def get_document(self, doc_id: int) -> dict | None:
        """getDocument(id) analogue (ElasticsearchClient.java:393-409):
        point lookup against the docstore — the EqualTo(doc_id) predicate
        reaches the parquet scan, so row groups outside the id's range
        are skipped."""
        rows = self.docstore.filter(F.col("doc_id") == int(doc_id)).limit(1).collect()
        return rows[0].asDict() if rows else None


def verify_sha256(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach ``content_sha256`` and (if the source already carries a
    ``content_sha256`` column) fail the build on any mismatch — the
    per-row invariant from BASELINE.json, mirroring the reference's
    byte-equality testing discipline."""
    computed = F.sha2(F.col(content_col).cast("binary"), 256)
    if "content_sha256" in docs.columns:
        bad = docs.filter(F.col("content_sha256") != computed).count()
        if bad:
            raise ValueError(f"sha256 invariant violated for {bad} rows")
        return docs
    return docs.withColumn("content_sha256", computed)


def build_index(
    corpus: DataFrame,
    text_col: str = "content",
    keys: tuple[str, ...] = ("repo", "path", "commit"),
    analyzer: str = "code",
    shard_size: int = DEFAULT_SHARD_SIZE,
    id_mode: str = "hash",
    with_positions: bool = True,
) -> BuiltIndex:
    docs = corpus if "doc_id" in corpus.columns else assign_doc_ids(corpus, keys, mode=id_mode)
    docs = verify_sha256(docs, text_col) if text_col in docs.columns else docs
    # small inputs (few files / few row groups) under-parallelize the
    # tokenize stage; spread them once.  At corpus scale the scan already
    # yields >> defaultParallelism splits, so this branch never fires and
    # no shuffle of raw text is added.
    sc = docs.sparkSession.sparkContext
    spread = min(sc.defaultParallelism, 16)  # enough waves for a small input;
    # more would just add per-task overhead to every downstream cache scan
    if docs.rdd.getNumPartitions() * 2 <= spread:
        docs = docs.repartition(spread)

    # CONTENT-FREE build cache (round-4): only (doc_id, dl, postings) is
    # persisted — everything the postings/terms/shards/stats derivations
    # touch — so peak storage memory scales with the index, not with the
    # corpus' content bytes (at 100 TB the old passthrough cache pinned
    # ~the corpus to memory-and-disk).  The docstore is a lazy view over
    # the INPUT frame (content columns + dl): never cached here; point
    # lookups push the doc_id predicate into the source scan, and the
    # at-scale path reads the docstore parquet a publish wrote once
    # (plans/lifecycle.save_index / build_and_publish).
    inverted = invert_docs(docs, text_col, analyzer)
    lean = inverted.select("doc_id", "dl", "postings").persist()
    postings = explode_postings(lean)
    if not with_positions:
        postings = postings.drop("pos_blob")
    # stats over docs that contain ≥1 token (Lucene field docCount)
    doclens = lean.filter(F.col("dl") > 0).select("doc_id", "dl").persist()
    n_docs, avgdl = corpus_stats(doclens)
    terms = term_stats(postings)
    # shards strategy (see build_shards_docwise): doc-wise shuffle + C
    # sort when shards outnumber cores and fit task memory, else the
    # streaming range strategy; both emit byte-identical shard rows
    n_parts = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    strategy = choose_shards_strategy(n_docs, avgdl, shard_size, n_parts)
    if strategy == "docwise" and with_positions:
        shards = build_shards_docwise(lean, shard_size=shard_size)
    elif strategy == "docwise":
        shards = build_shards_docwise(
            lean, shard_size=shard_size, with_positions=False
        )
    else:
        shards = build_shards(postings, shard_size=shard_size)
    docstore = docs.join(doclens, "doc_id", "left").fillna({"dl": 0})

    metrics = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "analyzer": analyzer,
        "shard_size": shard_size,
        "shards_strategy": strategy,
    }
    return BuiltIndex(
        docstore=docstore,
        postings=postings,
        shards=shards,
        terms=terms,
        doclens=doclens,
        n_docs=n_docs,
        avgdl=avgdl,
        shard_size=shard_size,
        metrics=metrics,
        shard_dl=build_shard_doclens(doclens, shard_size),
    )
