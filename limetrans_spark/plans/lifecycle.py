"""Index lifecycle: snapshots, atomic alias swap, retention, resumable
checkpointed builds with per-partition lineage + metrics.

Mirrors the reference's Elasticsearch index lifecycle
(``core/src/main/java/hbz/limetrans/ElasticsearchClient.java``):

* dated generation naming ``name-YYYYMMDD[-seq]``  (``:95-101,387-397``)
* ``switchIndex``: atomic alias move after a fully successful bulk,
  skipped on failure or zero docs                   (``:272-309``)
* ``retainIndexes``: keep the newest ``retain`` old generations
  (default 2), delete the rest                      (``:317-359,49``)
* bulk counters / failure accounting → build fails  (``:427-449``)

plus the north-rule additions the reference lacks: per-partition build
checkpoints with lineage (resume skips completed buckets) and build
metrics.

Layout under ``root/``::

    manifest.json                     # {"current": "<snapshot-name>"}  (alias)
    snapshots/<name>/manifest.json    # stats + config + metrics + lineage
    snapshots/<name>/{docstore,postings,terms,shards}/   (parquet)
    checkpoints/<build-id>/bucket=<b>/          (postings runs, parquet)
    checkpoints/<build-id>/_bucket_<b>.json     (per-bucket lineage marker)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.build import (
    BuiltIndex,
    assign_doc_ids,
    build_shards,
    corpus_stats,
    doc_lengths_from_dl_column,
    explode_postings,
    invert_docs,
    term_stats,
    verify_sha256,
)

ALIAS_FILE = "manifest.json"
DEFAULT_RETAIN = 2  # ElasticsearchClient.java:49


# --------------------------------------------------------------------------
# snapshots + alias + retention
# --------------------------------------------------------------------------


def _alias_path(root: str) -> str:
    return os.path.join(root, ALIAS_FILE)


def current_snapshot(root: str) -> str | None:
    p = _alias_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f).get("current")


def switch_alias(root: str, snapshot_name: str) -> None:
    """Atomic pointer swap (switchIndex analogue): write-temp + rename."""
    tmp = _alias_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"current": snapshot_name, "switched_at": time.time()}, f)
    os.replace(tmp, _alias_path(root))


_GEN_RE = re.compile(r"^(?P<base>.+)-(?P<date>\d{8})(?:-(?P<seq>\d+))?$")


def _snapshot_key(snap: str) -> tuple:
    """Chronological key for ``name-YYYYMMDD[-seq]``: (base, date, seq).
    Lexicographic sorting put 'x-20260816-10' before 'x-20260816-2';
    the seq must compare numerically (retainIndexes parity,
    ElasticsearchClient.java:387-397)."""
    m = _GEN_RE.match(snap)
    if m:
        return (m.group("base"), m.group("date"), int(m.group("seq") or 0), snap)
    # free-form generation labels: base = everything before the last '-',
    # chronology falls back to the label's lexicographic order
    base, sep, gen = snap.rpartition("-")
    return (base if sep else snap, gen, -1, snap)


def list_snapshots(root: str) -> list[str]:
    d = os.path.join(root, "snapshots")
    if not os.path.isdir(d):
        return []
    return sorted(os.listdir(d), key=_snapshot_key)


def retain_snapshots(root: str, retain: int = DEFAULT_RETAIN) -> list[str]:
    """Delete all but the newest ``retain`` non-current generations
    (retainIndexes analogue; the current snapshot is always kept).
    Retention pools are scoped per base name — generations of different
    indexes under one root never count against each other."""
    cur = current_snapshot(root)
    by_base: dict[str, list[str]] = {}
    for s in list_snapshots(root):
        if s == cur:
            continue
        by_base.setdefault(_snapshot_key(s)[0], []).append(s)
    doomed: list[str] = []
    for gens in by_base.values():  # already chronologically sorted
        doomed.extend(gens[: max(0, len(gens) - retain)])
    for name in doomed:
        shutil.rmtree(os.path.join(root, "snapshots", name), ignore_errors=True)
    return doomed


def save_index(
    idx: BuiltIndex,
    root: str,
    name: str,
    generation: str,
    publish: bool = True,
    retain: int = DEFAULT_RETAIN,
    extra_metrics: dict | None = None,
) -> str:
    """Write a full snapshot; on success swap the alias and prune old
    generations.  Publishes nothing on failure or an empty build
    (mirrors the skip guards at ElasticsearchClient.java:284-294)."""
    snap_name = f"{name}-{generation}"
    snap = os.path.join(root, "snapshots", snap_name)
    os.makedirs(snap, exist_ok=True)
    t0 = time.time()
    # the five artifacts all derive from the already-materialized
    # inverted cache — submit their jobs concurrently (Spark schedules
    # them across the same executors) instead of paying five sequential
    # job latencies; exceptions propagate so a failed write still fails
    # the publish (no alias swap)
    import concurrent.futures as _cf

    writes = [
        (idx.docstore, "docstore"),
        (idx.postings, "postings"),
        # term-sorted dictionary → parquet min/max row-group stats answer
        # prefix scans (t*) without reading the whole vocabulary
        (idx.terms.repartitionByRange("term").sortWithinPartitions("term"), "terms"),
        # total (shard, term) order → parquet file/row-group min-max
        # stats cluster by shard, so a replica opening a shard slice
        # (LocalSearcher.from_snapshot shard_subset pushdown) reads
        # ~slice-sized bytes, and the serving loader's composite key
        # index arrives pre-sorted (no argsort at open)
        (idx.shards.sort("shard", "term"), "shards"),
        (idx.shard_doclens(), "shard_dl"),
    ]
    with _cf.ThreadPoolExecutor(max_workers=len(writes)) as pool:
        futs = [
            pool.submit(
                lambda df, sub: df.write.mode("overwrite").parquet(
                    os.path.join(snap, sub)
                ),
                df,
                sub,
            )
            for df, sub in writes
        ]
        for f in futs:
            f.result()
    from ..operators.build import skew_report

    manifest = {
        "name": name,
        "generation": generation,
        "n_docs": idx.n_docs,
        "avgdl": idx.avgdl,
        "shard_size": idx.shard_size,
        "skew_top_df": skew_report(idx.terms, idx.n_docs) if idx.n_docs else [],
        "metrics": {**idx.metrics, **(extra_metrics or {}), "write_sec": round(time.time() - t0, 3)},
    }
    with open(os.path.join(snap, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    if publish and idx.n_docs > 0:
        switch_alias(root, snap_name)
        retain_snapshots(root, retain)
    return snap


def apply_deletes(
    idx: BuiltIndex,
    deleted_ids: DataFrame,
    deletion_literal: tuple[str, str] | None = None,
) -> BuiltIndex:
    """Delete documents from an index view — the analogue of the
    reference's bulk-delete + deletion-literal trigger
    (``ElasticsearchIndexer.java:79-126``: a record whose
    ``deletionLiteral`` field matches is deleted instead of indexed).

    ``deleted_ids``: DataFrame with a ``doc_id`` column; additionally any
    docstore row where column ``deletion_literal[0]`` equals value
    ``deletion_literal[1]`` is deleted.  Returns a new BuiltIndex whose
    postings/doclens/docstore exclude the victims and whose N/avgdl are
    recomputed — queries on the result never see deleted docs.  (The
    compressed shards are rebuilt lazily on the next publish; the flat
    path is authoritative for incremental serving.)
    """
    victims = deleted_ids.select("doc_id")
    if deletion_literal is not None:
        col, val = deletion_literal
        victims = victims.unionByName(
            idx.docstore.filter(F.col(col) == val).select("doc_id")
        )
    victims = victims.distinct().persist()
    docstore = idx.docstore.join(victims, "doc_id", "left_anti")
    doclens = idx.doclens.join(victims, "doc_id", "left_anti").persist()
    postings = idx.postings.join(victims, "doc_id", "left_anti")
    # exact int64-sum ÷ once (corpus_stats): float avg() is reduction-
    # order-dependent and would make post-delete ranks vary by partitioning
    from ..operators.build import build_shards, corpus_stats, term_stats

    n_docs, avgdl = corpus_stats(doclens)

    return BuiltIndex(
        docstore=docstore,
        postings=postings,
        shards=build_shards(postings, shard_size=idx.shard_size),
        terms=term_stats(postings),
        doclens=doclens,
        n_docs=n_docs,
        avgdl=avgdl,
        shard_size=idx.shard_size,
        metrics={**idx.metrics, "deletes_applied": True},
    )


def load_index(spark: SparkSession, root: str, snapshot: str | None = None) -> BuiltIndex:
    """Open a snapshot (default: the alias target) for querying.

    The returned frames read straight from parquet — term-predicate
    queries prune via parquet min/max stats on the term-sorted files."""
    snap_name = snapshot or current_snapshot(root)
    if snap_name is None:
        raise FileNotFoundError(f"no current snapshot under {root}")
    snap = os.path.join(root, "snapshots", snap_name)
    with open(os.path.join(snap, "manifest.json")) as f:
        m = json.load(f)
    docstore = spark.read.parquet(os.path.join(snap, "docstore"))
    postings = spark.read.parquet(os.path.join(snap, "postings"))
    if "dl" in postings.columns:
        postings = postings.drop("dl")
    terms = spark.read.parquet(os.path.join(snap, "terms"))
    shards = spark.read.parquet(os.path.join(snap, "shards"))
    doclens = docstore.select("doc_id", "dl")
    sdl_path = os.path.join(snap, "shard_dl")
    shard_dl = spark.read.parquet(sdl_path) if os.path.isdir(sdl_path) else None
    return BuiltIndex(
        docstore=docstore,
        postings=postings,
        shards=shards,
        terms=terms,
        doclens=doclens,
        n_docs=m["n_docs"],
        avgdl=m["avgdl"],
        shard_size=m["shard_size"],
        metrics=m.get("metrics", {}),
        shard_dl=shard_dl,
    )


# --------------------------------------------------------------------------
# checkpointed, resumable build
# --------------------------------------------------------------------------


@dataclass
class BuildReport:
    index: BuiltIndex
    snapshot: str
    metrics: dict


def _marker_path(ckpt: str, bucket: int) -> str:
    return os.path.join(ckpt, f"_bucket_{bucket}.json")


def _done_buckets(ckpt: str, n_buckets: int) -> set[int]:
    return {b for b in range(n_buckets) if os.path.exists(_marker_path(ckpt, b))}


def checkpointed_postings(
    docs: DataFrame,
    ckpt: str,
    n_buckets: int = 16,
    wave_size: int = 4,
    text_col: str = "content",
    analyzer: str = "code",
    with_positions: bool = True,
) -> tuple[DataFrame, dict]:
    """Build flat postings in resumable bucket waves.

    Buckets are a deterministic hash of ``doc_id`` (cluster-size
    independent).  Each wave processes ``wave_size`` buckets in one Spark
    job writing ``bucket=<b>/`` partitions (dynamic-overwrite → idempotent
    retries), then commits one lineage marker per bucket: row/posting
    counts, an order-independent input fingerprint (sum of doc_id·prime
    mod 2^61), and wall time.  Resume = skip buckets whose marker exists;
    a killed build restarts at the first incomplete wave.

    Returns (postings_df read back from the run directory, metrics).
    """
    spark = docs.sparkSession
    os.makedirs(ckpt, exist_ok=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucket_col = F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
    done = _done_buckets(ckpt, n_buckets)
    pending = [b for b in range(n_buckets) if b not in done]
    metrics: dict = {
        "n_buckets": n_buckets,
        "resumed_buckets": len(done),
        "built_buckets": len(pending),
        "waves": [],
    }
    runs_dir = os.path.join(ckpt, "runs")
    for w0 in range(0, len(pending), wave_size):
        wave = pending[w0 : w0 + wave_size]
        t0 = time.time()
        sub = docs.withColumn("_bucket", bucket_col).filter(F.col("_bucket").isin(wave))
        p = explode_postings(invert_docs(sub, text_col, analyzer), keep_dl=True)
        if not with_positions:
            p = p.drop("pos_blob")
        p = p.withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int"))
        p.write.mode("overwrite").partitionBy("bucket").parquet(runs_dir)
        # lineage per bucket (one small job over the wave's output)
        stats = {
            r["bucket"]: r
            for r in spark.read.parquet(runs_dir)
            .filter(F.col("bucket").isin(wave))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_postings"),
                F.countDistinct("doc_id").alias("n_docs"),
                # order-independent lineage fingerprint; decimal sum so the
                # accumulator can't overflow (ANSI mode) at any row count
                F.sum(
                    F.pmod(F.col("doc_id") * 31 + F.col("tf"), F.lit(1000000007))
                    .cast("decimal(38,0)")
                ).alias("fingerprint"),
            )
            .collect()
        }
        wall = round(time.time() - t0, 3)
        for b in wave:
            r = stats.get(b)
            with open(_marker_path(ckpt, b), "w") as f:
                json.dump(
                    {
                        "bucket": b,
                        "n_postings": int(r["n_postings"]) if r else 0,
                        "n_docs": int(r["n_docs"]) if r else 0,
                        "fingerprint": int(r["fingerprint"]) if r else 0,
                        "wave_sec": wall,
                        "committed_at": time.time(),
                    },
                    f,
                )
        metrics["waves"].append({"buckets": wave, "sec": wall})
    lineage = []
    for b in range(n_buckets):
        with open(_marker_path(ckpt, b)) as f:
            lineage.append(json.load(f))
    metrics["lineage"] = lineage
    metrics["n_postings"] = sum(m["n_postings"] for m in lineage)
    return spark.read.parquet(runs_dir).drop("bucket"), metrics


def build_and_publish(
    corpus: DataFrame,
    root: str,
    name: str,
    generation: str,
    text_col: str = "content",
    keys: tuple[str, ...] = ("repo", "path", "commit"),
    analyzer: str = "code",
    shard_size: int = 1 << 17,
    n_buckets: int = 16,
    wave_size: int = 4,
    retain: int = DEFAULT_RETAIN,
    update: bool = False,
) -> BuildReport:
    """Full lifecycle: ids → sha check → checkpointed postings → stats →
    shards → snapshot → alias swap → retention.  The checkpoint dir is
    keyed by (name, generation): re-running the same generation resumes.

    ``update=True`` is the reference's update mode
    (ElasticsearchClient.java:110-112, checkIndex at :204-209): the build
    must land in the CURRENT generation of an existing index — the alias
    is resolved to its concrete snapshot and the job fails fast when no
    index exists, instead of silently creating a fresh one.  The
    ``generation`` argument is ignored in update mode."""
    t_start = time.time()
    if update:
        cur = current_snapshot(root)
        if cur is None or not cur.startswith(f"{name}-"):
            raise FileNotFoundError(
                f"update mode requires an existing index for {name!r} "
                "(checkIndex: index not found)"
            )
        generation = cur[len(name) + 1 :]
    docs = corpus if "doc_id" in corpus.columns else assign_doc_ids(corpus, keys)
    docs = verify_sha256(docs, text_col) if text_col in docs.columns else docs
    docs = docs.persist()
    ckpt = os.path.join(root, "checkpoints", f"{name}-{generation}")
    postings, ck_metrics = checkpointed_postings(
        docs, ckpt, n_buckets=n_buckets, wave_size=wave_size,
        text_col=text_col, analyzer=analyzer,
    )
    doclens = doc_lengths_from_dl_column(postings).persist()
    postings = postings.drop("dl").persist()  # avoid dup-column with doclens joins
    n_docs, avgdl = corpus_stats(doclens)
    from ..operators.build import build_shard_doclens

    idx = BuiltIndex(
        docstore=docs.join(doclens, "doc_id", "left").fillna({"dl": 0}),
        postings=postings,
        shards=build_shards(postings, shard_size=shard_size),
        terms=term_stats(postings),
        doclens=doclens,
        n_docs=n_docs,
        avgdl=avgdl,
        shard_size=shard_size,
        metrics={"analyzer": analyzer, "n_docs": n_docs, "avgdl": avgdl},
        shard_dl=build_shard_doclens(doclens, shard_size),
    )
    snap = save_index(
        idx, root, name, generation, retain=retain,
        extra_metrics={**ck_metrics, "build_sec": round(time.time() - t_start, 3)},
    )
    # the docstore parquet is on disk now — release the content-carrying
    # corpus cache and serve further docstore reads (getDocument point
    # lookups) from the published artifact with pushed-down predicates;
    # storage memory stops scaling with content bytes the moment the
    # build completes
    dstore = os.path.join(snap, "docstore")
    if os.path.isdir(dstore):
        docs.unpersist()
        idx.docstore = corpus.sparkSession.read.parquet(dstore)
    return BuildReport(index=idx, snapshot=snap, metrics=ck_metrics)


# --------------------------------------------------------------------------
# fielded snapshots: one single-field snapshot tree per field
# --------------------------------------------------------------------------


def save_fielded(
    indexes: dict,
    root: str,
    name: str,
    generation: str,
    retain: int = DEFAULT_RETAIN,
) -> dict:
    """Persist a ``build_fielded_sharded`` result: each field's
    BuiltIndex snapshots under ``root/fields/<field>/`` with the normal
    lifecycle (alias swap, retention), plus a top-level manifest naming
    the fields so ``load_fielded`` needs no directory guessing."""
    paths = {}
    for fname, idx in sorted(indexes.items()):
        paths[fname] = save_index(
            idx, os.path.join(root, "fields", fname), name, generation, retain=retain
        )
    tmp = os.path.join(root, "fielded_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"name": name, "generation": generation, "fields": sorted(indexes)}, f)
    os.replace(tmp, os.path.join(root, "fielded_manifest.json"))
    return paths


def publish_delta_segment(
    spark: SparkSession,
    prev_snap: str,
    delta_docs: DataFrame,
    root: str,
    name: str,
    generation: str,
    text_col: str = "content",
    retain: int = DEFAULT_RETAIN,
    deleted_ids: DataFrame | None = None,
) -> str:
    """Publish a Lucene-segment-style DELTA snapshot: a small full
    index (positions included) over ONLY the updated/new documents,
    plus the exactly-merged global statistics and the tombstone list,
    so :class:`operators.serve.SegmentedSearcher` can answer over
    (base snapshot minus tombstones) + delta with scores bit-identical
    to a full rebuild over the final corpus state — the update path
    whose cost scales with the UPDATE size (build of the delta docs +
    one column-pruned scan of the base postings/docstore for the
    removed contributions), never with the corpus.  This is how
    Lucene/Elasticsearch actually absorb updates (segments + deletes)
    — ``ElasticsearchIndexer.java:88-164`` update semantics — where
    :func:`streaming.ingest.compact_deltas` is the periodic full fold.

    ``delta_docs`` must carry ``doc_id`` (stable global ids; an id
    already in the base snapshot REPLACES that document, a new id
    appends).  The merged dictionary's ``max_tf`` is
    ``greatest(base, delta)`` — an upper bound (exact recomputation
    would need the full corpus), sound for WAND pruning and unused by
    the serving scorers; df/cf/N/avgdl are EXACT (int64 arithmetic,
    one float division — the same expression ``corpus_stats`` uses,
    so the merged avgdl is bit-equal to a rebuild's)."""
    from ..operators.build import build_index

    with open(os.path.join(prev_snap, "manifest.json")) as f:
        pm = json.load(f)
    shard_size = int(pm["shard_size"])
    analyzer = (pm.get("metrics") or {}).get("analyzer") or "code"
    if "doc_id" not in delta_docs.columns:
        raise ValueError("delta_docs must carry stable global doc_id")

    delta_idx = build_index(
        delta_docs, text_col=text_col, analyzer=analyzer, shard_size=shard_size
    )
    # tombstones = superseded docs plus outright deletions (a deleted id
    # contributes a tombstone and a stats removal, but no delta doc —
    # the deletionLiteral flow's segment-level analogue).  Taken from
    # delta_docs' ids, NOT from the delta doclens: an update whose new
    # text tokenizes to nothing must still ERASE its old document.
    upd = delta_docs.select(F.col("doc_id").cast("long")).distinct()
    if deleted_ids is not None:
        upd = upd.unionByName(
            deleted_ids.select(F.col("doc_id").cast("long"))
        ).distinct()

    return _publish_segment_of(
        spark, prev_snap, delta_idx, upd, root, name, generation, retain
    )


def segment_chain(snap: str) -> list[str]:
    """Follow ``segment_of`` links from a snapshot back to its base —
    returns ``[base, d1, ..., snap]`` oldest-first (a plain snapshot is
    a one-element chain).  Each delta segment records the snapshot it
    was published against, so pointing any API at the NEWEST segment is
    enough to recover the whole Lucene-style segment stack."""
    chain = []
    cur: str | None = snap
    while cur:
        chain.append(cur)
        with open(os.path.join(cur, "manifest.json")) as f:
            m = json.load(f).get("metrics") or {}
        cur = m.get("segment_of")
        if cur in chain:
            raise ValueError(f"segment_of cycle at {cur}")
    return chain[::-1]


def _publish_segment_of(
    spark: SparkSession,
    prev_snap: str,
    delta_idx: BuiltIndex,
    upd: DataFrame,
    root: str,
    name: str,
    generation: str,
    retain: int,
) -> str:
    """Merge statistics + publish one delta segment (shared by the flat
    and fielded segment publishers).  df/cf/N/avgdl are exact via int64
    removal arithmetic; the dl aggregates count only rows with dl > 0
    so per-field segments (where many corpus docs have no tokens in a
    given field) match ``corpus_stats``' doclens-based N exactly.

    ``prev_snap`` may itself be a delta segment: the previous-state
    dictionary then comes from ITS exactly-merged ``merged_terms`` +
    ``merged_n_docs``/``merged_sum_dl`` (no base recomputation — the
    stats cost of stacking segment N+1 is independent of stack depth),
    and the removed contributions are scanned per chain segment over
    only the updated docs whose LIVE version sits in that segment (a
    doc's live postings are in the newest segment that contains it and
    that no newer tombstone kills)."""
    chain = segment_chain(prev_snap)

    if len(chain) == 1:
        prev_terms = spark.read.parquet(
            os.path.join(prev_snap, "terms")
        ).select("term", "df", "cf", "max_tf")
        prev_doc = (
            spark.read.parquet(os.path.join(prev_snap, "docstore"))
            .select("doc_id", "dl")
            .where(F.col("dl") > 0)  # mirror corpus_stats' doclens basis
        )
        prev_row = prev_doc.agg(
            F.count("*").alias("n"), F.sum("dl").cast("long").alias("s")
        ).collect()[0]
        n_prev, s_prev = int(prev_row["n"]), int(prev_row["s"] or 0)
    else:
        prev_terms = spark.read.parquet(
            os.path.join(prev_snap, "merged_terms")
        ).select("term", "df", "cf", "max_tf")
        with open(os.path.join(prev_snap, "manifest.json")) as f:
            pmx = json.load(f)["metrics"]
        n_prev, s_prev = int(pmx["merged_n_docs"]), int(pmx["merged_sum_dl"])

    # removed contributions: walk the stack newest→oldest; in each
    # segment, only updated docs NOT superseded by a newer tombstone
    # still contribute postings/dl there
    removed_parts = []
    rm_n = rm_s = 0
    newer_tombs: DataFrame | None = None
    for seg in reversed(chain):
        upd_live = (
            upd
            if newer_tombs is None
            else upd.join(F.broadcast(newer_tombs), "doc_id", "left_anti")
        )
        removed_parts.append(
            spark.read.parquet(os.path.join(seg, "postings"))
            .select("term", "doc_id", "tf")
            .join(F.broadcast(upd_live), "doc_id", "left_semi")
        )
        row = (
            spark.read.parquet(os.path.join(seg, "docstore"))
            .select("doc_id", "dl")
            .where(F.col("dl") > 0)
            .join(F.broadcast(upd_live), "doc_id", "left_semi")
            .agg(F.count("*").alias("n"), F.sum("dl").cast("long").alias("s"))
            .collect()[0]
        )
        rm_n += int(row["n"])
        rm_s += int(row["s"] or 0)
        tomb_dir = os.path.join(seg, "tombstones")
        if os.path.isdir(tomb_dir):
            t = spark.read.parquet(tomb_dir).select("doc_id")
            newer_tombs = (
                t if newer_tombs is None
                else newer_tombs.unionByName(t).distinct()
            )
    rm_all = removed_parts[0]
    for part in removed_parts[1:]:
        rm_all = rm_all.unionByName(part)
    removed = rm_all.groupBy("term").agg(
        F.count("*").cast("long").alias("df_rm"),
        F.sum("tf").cast("long").alias("cf_rm"),
    )
    dterms = delta_idx.terms.select(
        "term",
        F.col("df").alias("df_d"),
        F.col("cf").alias("cf_d"),
        F.col("max_tf").alias("max_tf_d"),
    )
    zero = F.lit(0).cast("long")
    merged = (
        prev_terms
        .join(removed, "term", "left")
        .join(dterms, "term", "full")
        .select(
            "term",
            (
                F.coalesce("df", zero)
                - F.coalesce("df_rm", zero)
                + F.coalesce("df_d", zero)
            ).cast("long").alias("df"),
            (
                F.coalesce("cf", zero)
                - F.coalesce("cf_rm", zero)
                + F.coalesce("cf_d", zero)
            ).cast("long").alias("cf"),
            F.greatest(
                F.coalesce("max_tf", F.lit(0)), F.coalesce("max_tf_d", F.lit(0))
            ).cast("int").alias("max_tf"),
        )
        .where(F.col("df") > 0)
        .withColumn("tlen", F.length("term").cast("int"))
    )

    d_row = delta_idx.doclens.agg(
        F.count("*").alias("n"), F.sum("dl").cast("long").alias("s")
    ).collect()[0]
    n2 = n_prev - rm_n + int(d_row["n"])
    sum2 = s_prev - rm_s + int(d_row["s"] or 0)
    avgdl2 = sum2 / n2 if n2 else 0.0  # same expression as corpus_stats

    # publish=False + explicit alias swap: save_index's empty-build
    # guard is right for FULL builds but a DELETION-ONLY delta segment
    # (0 delta docs, tombstones only) is legitimate and must still
    # become the field root's current snapshot — the fielded publishers
    # and the checker resolve segments through the alias
    snap = save_index(
        delta_idx,
        root,
        name,
        generation,
        retain=retain,
        publish=False,
        extra_metrics={
            "segment_of": prev_snap,
            "merged_n_docs": n2,
            "merged_avgdl": avgdl2,
            "merged_sum_dl": sum2,
        },
    )
    switch_alias(root, f"{name}-{generation}")
    retain_snapshots(root, retain)
    merged.repartitionByRange("term").sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(os.path.join(snap, "merged_terms"))
    upd.write.mode("overwrite").parquet(os.path.join(snap, "tombstones"))
    return snap


def publish_fielded_delta_segment(
    spark: SparkSession,
    prev_root: str,
    delta_docs: DataFrame,
    root: str,
    name: str,
    generation: str,
    fields: dict,
    copy_to: dict | None = None,
    target_analyzers: dict | None = None,
    retain: int = DEFAULT_RETAIN,
    deleted_ids: DataFrame | None = None,
) -> dict:
    """Fielded twin of :func:`publish_delta_segment`: one delta segment
    per field (same ``fields``/``copy_to``/``target_analyzers`` config
    the BASE ``save_fielded`` tree was built with — the config is the
    caller's contract, exactly as for a rebuild), each with its own
    exactly-merged per-field statistics and the SHARED doc-level
    tombstone list.  ``operators.fielded.SegmentedFielded`` serves the
    pair bit-identically to a fielded rebuild."""
    from ..operators.fielded import build_fielded_sharded

    if "doc_id" not in delta_docs.columns:
        raise ValueError("delta_docs must carry stable global doc_id")
    with open(os.path.join(prev_root, "fielded_manifest.json")) as f:
        base_fields = sorted(json.load(f)["fields"])
    f0_root = os.path.join(prev_root, "fields", base_fields[0])
    f0_snap = current_snapshot(f0_root)
    if f0_snap is None:
        raise FileNotFoundError(f"base field {base_fields[0]!r} has no snapshot")
    with open(
        os.path.join(f0_root, "snapshots", f0_snap, "manifest.json")
    ) as f:
        shard_size = int(json.load(f)["shard_size"])
    delta_idxs = build_fielded_sharded(
        delta_docs,
        fields,
        copy_to=copy_to,
        target_analyzers=target_analyzers,
        shard_size=shard_size,
    )
    upd = delta_docs.select(F.col("doc_id").cast("long")).distinct()
    if deleted_ids is not None:
        upd = upd.unionByName(
            deleted_ids.select(F.col("doc_id").cast("long"))
        ).distinct()
    paths = {}
    for fname, idx in sorted(delta_idxs.items()):
        froot = os.path.join(prev_root, "fields", fname)
        snap = current_snapshot(froot)
        if snap is None:
            raise FileNotFoundError(f"base field {fname!r} has no snapshot")
        paths[fname] = _publish_segment_of(
            spark,
            os.path.join(froot, "snapshots", snap),
            idx,
            upd,
            os.path.join(root, "fields", fname),
            name,
            generation,
            retain,
        )
    tmp = os.path.join(root, "fielded_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "name": name,
                "generation": generation,
                "fields": sorted(delta_idxs),
                "segment_of": prev_root,
            },
            f,
        )
    os.replace(tmp, os.path.join(root, "fielded_manifest.json"))
    return paths


def compact_segments(
    spark: SparkSession,
    newest_snap: str,
    root: str,
    name: str,
    generation: str,
    text_col: str = "content",
    retain: int = DEFAULT_RETAIN,
) -> str:
    """Fold a whole segment stack back into a fresh base snapshot — the
    periodic compaction that bounds stack depth (Lucene's merge policy
    analogue).  The final corpus state is reassembled from the stack's
    OWN docstores (each segment's docstore carries the document
    content; a doc's live version sits in the newest segment that holds
    it and that no newer tombstone kills), retokenized with the stack's
    analyzer, and published WITHOUT a ``segment_of`` link.  Unlike the
    positionless streaming-delta compaction
    (``streaming.ingest.compact_deltas``), the result is a FULL
    positional index: compact(stack) ≡ rebuild over the final corpus,
    bit-identical BM25 including phrases (pytest
    ``test_compact_segments_equals_rebuild``).  The ride-along
    ``content_sha256`` column is re-verified during the rebuild, so a
    corrupted docstore fails the compaction instead of publishing."""
    from ..operators.build import build_index

    chain = segment_chain(newest_snap)
    if len(chain) < 2:
        raise ValueError(f"{newest_snap} has no segment_of link")
    with open(os.path.join(newest_snap, "manifest.json")) as f:
        nm = json.load(f)
    analyzer = (nm.get("metrics") or {}).get("analyzer") or "code"
    shard_size = int(nm["shard_size"])

    final = None
    newer_tombs: DataFrame | None = None
    for seg in reversed(chain):
        d = spark.read.parquet(os.path.join(seg, "docstore")).drop("dl")
        if newer_tombs is not None:
            d = d.join(F.broadcast(newer_tombs), "doc_id", "left_anti")
        final = d if final is None else final.unionByName(
            d, allowMissingColumns=True
        )
        tomb_dir = os.path.join(seg, "tombstones")
        if os.path.isdir(tomb_dir):
            t = spark.read.parquet(tomb_dir).select("doc_id")
            newer_tombs = (
                t if newer_tombs is None
                else newer_tombs.unionByName(t).distinct()
            )
    idx = build_index(
        final, text_col=text_col, analyzer=analyzer, shard_size=shard_size
    )
    return save_index(idx, root, name, generation, retain=retain)


def fielded_segment_chain(root: str) -> list[str]:
    """Follow ``segment_of`` links between fielded trees (written by
    :func:`publish_fielded_delta_segment`) — returns roots oldest-first."""
    chain = []
    cur: str | None = root
    while cur:
        chain.append(cur)
        with open(os.path.join(cur, "fielded_manifest.json")) as f:
            cur = json.load(f).get("segment_of")
        if cur in chain:
            raise ValueError(f"segment_of cycle at {cur}")
    return chain[::-1]


def check_segments(
    spark: SparkSession, newest_snap: str, deep: bool = False
) -> dict:
    """CheckIndex analogue for a segment stack (the reference runs
    Lucene's checkIndex before trusting an index —
    ``ElasticsearchServer.java`` check/update mode): recompute the
    final state's df/cf/N/Σdl from the stack's own postings/docstores
    (live-version walk: each segment minus the union of newer
    tombstones) and compare against the newest segment's exactly-merged
    statistics, and verify no doc id is live in two segments at once
    (a missing tombstone).  ``deep=True`` additionally decodes every
    compressed posting run in EACH segment's shards artifact
    (:func:`operators.build.deep_check_shards`) and cross-checks the
    artifact's per-term totals against that segment's own flat postings
    (pre-tombstone — the shards file stores the segment's contribution,
    not the live view).  Returns a report dict with ``ok``; raises
    ``ValueError`` on any mismatch so lifecycle scripts fail loudly."""
    chain = segment_chain(newest_snap)
    if len(chain) < 2:
        raise ValueError(f"{newest_snap} has no segment_of link")

    live_posts = None
    live_docs = None
    newer_tombs: DataFrame | None = None
    for seg in reversed(chain):
        post = spark.read.parquet(os.path.join(seg, "postings")).select(
            "term", "doc_id", "tf"
        )
        doc = (
            spark.read.parquet(os.path.join(seg, "docstore"))
            .select("doc_id", "dl")
            .where(F.col("dl") > 0)
        )
        if newer_tombs is not None:
            post = post.join(F.broadcast(newer_tombs), "doc_id", "left_anti")
            doc = doc.join(F.broadcast(newer_tombs), "doc_id", "left_anti")
        live_posts = post if live_posts is None else live_posts.unionByName(post)
        live_docs = doc if live_docs is None else live_docs.unionByName(doc)
        tomb_dir = os.path.join(seg, "tombstones")
        if os.path.isdir(tomb_dir):
            t = spark.read.parquet(tomb_dir).select("doc_id")
            newer_tombs = (
                t if newer_tombs is None
                else newer_tombs.unionByName(t).distinct()
            )

    dup_docs = (
        live_docs.groupBy("doc_id").count().where(F.col("count") > 1).count()
    )
    # dangling postings: a doc id with live postings but no live
    # docstore row would break getDocument while leaving every
    # statistic consistent (both df/cf and N derive from postings)
    orphans = (
        live_posts.select("doc_id").distinct()
        .join(live_docs.select("doc_id"), "doc_id", "left_anti")
        .count()
    )
    doc_row = live_docs.agg(
        F.count("*").alias("n"), F.sum("dl").cast("long").alias("s")
    ).collect()[0]
    recomputed = live_posts.groupBy("term").agg(
        F.count("*").cast("long").alias("df_r"),
        F.sum("tf").cast("long").alias("cf_r"),
    )
    merged = spark.read.parquet(
        os.path.join(newest_snap, "merged_terms")
    ).select("term", "df", "cf")
    zero = F.lit(0).cast("long")
    stat_mismatches = (
        merged.join(recomputed, "term", "full")
        .where(
            (F.coalesce("df", zero) != F.coalesce("df_r", zero))
            | (F.coalesce("cf", zero) != F.coalesce("cf_r", zero))
        )
        .count()
    )
    with open(os.path.join(newest_snap, "manifest.json")) as f:
        mm = json.load(f)["metrics"]
    report = {
        "segments": len(chain),
        "n_docs": int(doc_row["n"]),
        "n_docs_expected": int(mm["merged_n_docs"]),
        "sum_dl": int(doc_row["s"] or 0),
        "sum_dl_expected": int(mm["merged_sum_dl"]),
        "term_stat_mismatches": int(stat_mismatches),
        "duplicate_live_docs": int(dup_docs),
        "orphan_posting_docs": int(orphans),
    }
    if deep:
        from ..operators.build import deep_check_shards

        per_seg = []
        for seg in chain:
            with open(os.path.join(seg, "manifest.json")) as f:
                seg_size = int(json.load(f)["shard_size"])
            shards = spark.read.parquet(os.path.join(seg, "shards"))
            d = deep_check_shards(shards, seg_size)
            own = (
                spark.read.parquet(os.path.join(seg, "postings"))
                .groupBy("term")
                .agg(
                    F.count("*").cast("long").alias("df_r"),
                    F.sum("tf").cast("long").alias("cf_r"),
                )
            )
            totals = shards.groupBy("term").agg(
                F.sum("n").cast("long").alias("df_s"),
                F.sum("sum_tf").cast("long").alias("cf_s"),
            )
            d["shard_stat_mismatches"] = (
                own.join(totals, "term", "full")
                .where(
                    (F.coalesce("df_r", zero) != F.coalesce("df_s", zero))
                    | (F.coalesce("cf_r", zero) != F.coalesce("cf_s", zero))
                )
                .count()
            )
            per_seg.append(d)
        report["deep"] = {
            "per_segment": per_seg,
            "violations": sum(
                d["violations"] + d["shard_stat_mismatches"] for d in per_seg
            ),
        }
    report["ok"] = (
        report["n_docs"] == report["n_docs_expected"]
        and report["sum_dl"] == report["sum_dl_expected"]
        and report["term_stat_mismatches"] == 0
        and report["duplicate_live_docs"] == 0
        and report["orphan_posting_docs"] == 0
        and (not deep or report["deep"]["violations"] == 0)
    )
    if not report["ok"]:
        raise ValueError(f"segment stack check failed: {report}")
    return report


def check_index(spark: SparkSession, snap: str, deep: bool = False) -> dict:
    """checkIndex for ANY snapshot (the reference gates every publish on
    Lucene's checkIndex — ``ElasticsearchClient.java:204-209``): a
    segment stack delegates to :func:`check_segments`; a plain snapshot
    is verified self-consistently — per-term df/cf recomputed from the
    postings parquet vs the published ``terms`` dictionary, the SERVING
    artifact's per-term totals (``shards`` rows carry ``n``/``sum_tf``)
    cross-checked against the same dictionary, and N/avgdl recomputed
    from the docstore vs the manifest (avgdl via the exact ``int64 sum
    ÷ once`` expression ``corpus_stats`` uses, so a healthy snapshot
    matches bit-for-bit).  ``deep=True`` additionally decodes every
    compressed posting run in the shards artifact and validates the
    codec invariants (:func:`operators.build.deep_check_shards`).
    Raises ``ValueError`` on any mismatch."""
    if len(segment_chain(snap)) > 1:
        return check_segments(spark, snap, deep=deep)

    post = spark.read.parquet(os.path.join(snap, "postings")).select(
        "term", "doc_id", "tf"
    )
    recomputed = post.groupBy("term").agg(
        F.count("*").cast("long").alias("df_r"),
        F.sum("tf").cast("long").alias("cf_r"),
    )
    terms = spark.read.parquet(os.path.join(snap, "terms")).select(
        "term", "df", "cf"
    )
    zero = F.lit(0).cast("long")
    stat_mismatches = (
        terms.join(recomputed, "term", "full")
        .where(
            (F.coalesce("df", zero) != F.coalesce("df_r", zero))
            | (F.coalesce("cf", zero) != F.coalesce("cf_r", zero))
        )
        .count()
    )
    # serving-artifact cross-check: the shards rows carry per-run n /
    # sum_tf, so per-term totals recompute without decoding any blob
    # (column-pruned scan — doc/tf/pos blobs are never read here)
    shards = spark.read.parquet(os.path.join(snap, "shards"))
    shard_totals = shards.groupBy("term").agg(
        F.sum("n").cast("long").alias("df_s"),
        F.sum("sum_tf").cast("long").alias("cf_s"),
    )
    shard_mismatches = (
        terms.join(shard_totals, "term", "full")
        .where(
            (F.coalesce("df", zero) != F.coalesce("df_s", zero))
            | (F.coalesce("cf", zero) != F.coalesce("cf_s", zero))
        )
        .count()
    )
    doc = (
        spark.read.parquet(os.path.join(snap, "docstore"))
        .select("doc_id", "dl")
        .where(F.col("dl") > 0)
    )
    doc_row = doc.agg(
        F.count("*").alias("n"),
        F.sum("dl").cast("long").alias("s"),
        F.count_distinct("doc_id").alias("n_distinct"),
    ).collect()[0]
    n = int(doc_row["n"])
    orphans = (
        post.select("doc_id").distinct()
        .join(doc.select("doc_id"), "doc_id", "left_anti")
        .count()
    )
    with open(os.path.join(snap, "manifest.json")) as f:
        mani = json.load(f)
    report = {
        "segments": 1,
        "n_docs": n,
        "n_docs_expected": int(mani["n_docs"]),
        "avgdl": (int(doc_row["s"] or 0) / n if n else 0.0),
        "avgdl_expected": float(mani["avgdl"]),
        "term_stat_mismatches": int(stat_mismatches),
        "shard_stat_mismatches": int(shard_mismatches),
        "duplicate_live_docs": n - int(doc_row["n_distinct"]),
        "orphan_posting_docs": int(orphans),
    }
    if deep:
        from ..operators.build import deep_check_shards

        report["deep"] = deep_check_shards(shards, int(mani["shard_size"]))
    report["ok"] = (
        report["n_docs"] == report["n_docs_expected"]
        and report["avgdl"] == report["avgdl_expected"]
        and report["term_stat_mismatches"] == 0
        and report["shard_stat_mismatches"] == 0
        and report["duplicate_live_docs"] == 0
        and report["orphan_posting_docs"] == 0
        and (not deep or report["deep"]["violations"] == 0)
    )
    if not report["ok"]:
        raise ValueError(f"snapshot check failed: {report}")
    return report


def check_fielded_segments(
    spark: SparkSession, newest_root: str, deep: bool = False
) -> dict:
    """Fielded twin of :func:`check_index`: validate every field's
    snapshot stack independently (per-field df/cf/N/Σdl recomputation
    vs the published merged statistics), then the two invariants that
    make a fielded stack one coherent index rather than F unrelated
    ones — every field's chain has the SAME depth (the fields were
    published together), and every segment level carries the IDENTICAL
    doc-level tombstone list across fields
    (:func:`publish_fielded_delta_segment` writes one shared list per
    level; a field missing a tombstone would serve a stale doc version
    for that field only, silently breaking cross-field conjunctions).
    Raises ``ValueError`` on any violation."""
    with open(os.path.join(newest_root, "fielded_manifest.json")) as f:
        fields = sorted(json.load(f)["fields"])

    reports: dict = {}
    chains: dict[str, list[str]] = {}
    for fname in fields:
        froot = os.path.join(newest_root, "fields", fname)
        snap_name = current_snapshot(froot)
        if snap_name is None:
            raise ValueError(f"field {fname!r} has no current snapshot")
        snap = os.path.join(froot, "snapshots", snap_name)
        reports[fname] = check_index(spark, snap, deep=deep)
        chains[fname] = segment_chain(snap)

    depths = {fname: len(c) for fname, c in chains.items()}
    if len(set(depths.values())) != 1:
        raise ValueError(f"fielded stack depths differ across fields: {depths}")
    depth = depths[fields[0]]

    tomb_mismatch_levels = []
    for level in range(1, depth):  # level 0 = base, no tombstones
        ref = spark.read.parquet(
            os.path.join(chains[fields[0]][level], "tombstones")
        ).select("doc_id")
        for fname in fields[1:]:
            other = spark.read.parquet(
                os.path.join(chains[fname][level], "tombstones")
            ).select("doc_id")
            diff = (
                ref.exceptAll(other).count() + other.exceptAll(ref).count()
            )
            if diff:
                tomb_mismatch_levels.append((level, fname, int(diff)))
    report = {
        "fields": reports,
        "segments": depth,
        "tombstone_mismatches": tomb_mismatch_levels,
        "ok": not tomb_mismatch_levels,
    }
    if not report["ok"]:
        raise ValueError(f"fielded stack check failed: {tomb_mismatch_levels}")
    return report


def compact_fielded_segments(
    spark: SparkSession,
    newest_root: str,
    root: str,
    name: str,
    generation: str,
    fields: dict,
    copy_to: dict | None = None,
    target_analyzers: dict | None = None,
    retain: int = DEFAULT_RETAIN,
) -> dict:
    """Fielded twin of :func:`compact_segments`: fold a fielded segment
    stack into a fresh ``save_fielded`` tree.  The final corpus rows are
    reconstructed from the stack's own per-field docstores (each
    declared field's docstore carries that field's source column;
    joining them on ``doc_id`` recovers the original multi-column rows
    — copy_to targets are derived, so they rebuild from the sources),
    live-filtered per tree by the newer trees' shared tombstones, and
    rebuilt with the SAME ``fields``/``copy_to``/``target_analyzers``
    config the stack was built with (the caller's contract, exactly as
    for the publishers) — bit-identical to serving the stack (pytest
    ``test_compact_fielded_segments_equals_stack``)."""
    from ..operators.fielded import _norm_fields, build_fielded_sharded

    chain = fielded_segment_chain(newest_root)
    if len(chain) < 2:
        raise ValueError(f"{newest_root} has no segment_of link")
    norm = _norm_fields(fields)

    def field_snap(tree: str, fname: str) -> str:
        froot = os.path.join(tree, "fields", fname)
        snap = current_snapshot(froot)
        if snap is None:
            raise FileNotFoundError(f"field {fname!r} has no snapshot in {tree}")
        return os.path.join(froot, "snapshots", snap)

    f0 = sorted(norm)[0]
    with open(os.path.join(field_snap(chain[0], f0), "manifest.json")) as f:
        shard_size = int(json.load(f)["shard_size"])

    final = None
    newer_tombs: DataFrame | None = None
    for tree in reversed(chain):
        rows = None
        for fname, (src, _an) in sorted(norm.items()):
            d = (
                spark.read.parquet(os.path.join(field_snap(tree, fname), "docstore"))
                .select("doc_id", F.col("content").alias(src))
            )
            rows = d if rows is None else rows.join(d, "doc_id")
        if newer_tombs is not None:
            rows = rows.join(F.broadcast(newer_tombs), "doc_id", "left_anti")
        final = rows if final is None else final.unionByName(rows)
        tomb_dir = os.path.join(field_snap(tree, f0), "tombstones")
        if os.path.isdir(tomb_dir):
            t = spark.read.parquet(tomb_dir).select("doc_id")
            newer_tombs = (
                t if newer_tombs is None
                else newer_tombs.unionByName(t).distinct()
            )
    idxs = build_fielded_sharded(
        final,
        fields,
        copy_to=copy_to,
        target_analyzers=target_analyzers,
        shard_size=shard_size,
    )
    return save_fielded(idxs, root, name, generation, retain=retain)


def load_fielded(spark: SparkSession, root: str) -> dict:
    """Open every field's current snapshot → {field: BuiltIndex}."""
    with open(os.path.join(root, "fielded_manifest.json")) as f:
        m = json.load(f)
    return {
        fname: load_index(spark, os.path.join(root, "fields", fname))
        for fname in m["fields"]
    }
