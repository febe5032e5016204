#!/usr/bin/env python
"""Incremental-ingest probe at 1M docs — the update half of the
reference's daily-rebuild + incremental-update split
(``ElasticsearchClient`` rebuild vs ``update`` mode), exercised at 200×
the driver's gate scale through the REAL Structured Streaming path:

  landing JSONL → corpus_stream → incremental_index (availableNow,
  exactly-once via checkpoint) → postings deltas → compact_deltas

Checks (assertions, not just timings):
  * compact(initial ingest + 1% re-index delta) ≡ batch build over the
    final corpus state: n_docs, avgdl, term df, and 20-deep BM25 top-k
    (ids AND scores to 1e-9) on common/rare/fresh-term queries, on the
    sharded WAND tier;
  * replace semantics at scale: re-indexed docs ERASE their old
    postings — the conjunction (fresh-term AND old-~97%-df-term) over
    the compacted index must be EMPTY, since updated docs dropped all
    old terms and no other doc contains the fresh term;
  * the delta pass processes ONLY the new files (exactly-once): the
    second streaming run's row count equals the update count.

Prints ONE JSON line (timings + booleans + host-noise probe); the
transcript is committed as BENCH/ingest_probe_r{N}_1M.json.  The
instructive scale numbers: wall for the 1% incremental pass + compact
vs wall for the full rebuild — the ratio is what a 100 TB deployment
saves per update cycle.

Run: python tools/ingest_probe.py [n_docs] (default 1_000_000)
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import noise_probe  # noqa: E402
from limetrans_spark.operators import query as Q  # noqa: E402
from limetrans_spark.operators.build import build_index  # noqa: E402
from limetrans_spark.session import get_spark  # noqa: E402
from limetrans_spark.sources.corpus import rich_corpus  # noqa: E402
from limetrans_spark.streaming import ingest  # noqa: E402

FRESH = "freshupdateterm"


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def topk(idx, q, k=20):
    return [
        (r.doc_id, round(r.score, 9))
        for r in Q.bm25_topk_sharded(idx, q, k=k).collect()
    ]


def main(n_docs: int = 1_000_000) -> int:
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    res = {"metric": "ingest-probe", "n_docs": n_docs}
    res["noise_probe_sec"] = [noise_probe()]

    root = tempfile.mkdtemp(prefix="ingest_probe_")
    landing = os.path.join(root, "landing")
    out = os.path.join(root, "postings")
    ckpt = os.path.join(root, "ckpt")
    try:
        docs = rich_corpus(spark, n_docs, vocab=20_000, partitions=32).persist()
        _, t_gen = timed(docs.count)
        res["gen_sec"] = round(t_gen, 2)

        as_corpus = docs.select(
            "doc_id",
            F.lit("probe-repo").alias("repo"),
            F.concat(F.lit("f/"), F.col("doc_id")).alias("path"),
            F.lit("c0").alias("commit"),
            F.lit("txt").alias("lang"),
            F.col("text").alias("content"),
        )
        _, t_land = timed(
            lambda: as_corpus.repartition(32).write.json(landing)
        )
        res["landing_write_sec"] = round(t_land, 2)

        # initial full ingest through the streaming path
        _, t_ingest = timed(
            lambda: ingest.incremental_index(
                ingest.corpus_stream(spark, landing, max_files_per_trigger=64),
                out, ckpt, text_col="content", analyzer="simple",
            ).awaitTermination()
        )
        res["ingest_full_sec"] = round(t_ingest, 2)
        res["ingest_docs_per_sec"] = round(n_docs / t_ingest, 1)
        log(f"initial streaming ingest {t_ingest:.1f}s")
        initial_batches = {
            r["batch"]
            for r in spark.read.parquet(out).select("batch").distinct().collect()
        }

        # 1% re-index delta: full replacement content (old terms must
        # vanish), distinguishable via a fresh term no other doc has
        upd = docs.where(F.col("doc_id") % 100 == 7).select(
            "doc_id",
            F.lit("probe-repo").alias("repo"),
            F.concat(F.lit("f/"), F.col("doc_id")).alias("path"),
            F.lit("c1").alias("commit"),
            F.lit("txt").alias("lang"),
            F.concat(
                F.lit(FRESH + " "),
                F.lit(FRESH + " shared"),
                F.lit("tail"),
                (F.col("doc_id") % 37).cast("string"),
            ).alias("content"),
        ).persist()
        n_upd = upd.count()
        res["update_docs"] = n_upd
        upd.repartition(4).write.mode("append").json(landing)

        _, t_delta = timed(
            lambda: ingest.incremental_index(
                ingest.corpus_stream(spark, landing, max_files_per_trigger=64),
                out, ckpt, text_col="content", analyzer="simple",
            ).awaitTermination()
        )
        res["ingest_delta_sec"] = round(t_delta, 2)
        log(f"delta ingest ({n_upd} docs) {t_delta:.1f}s")
        # exactly-once: the second run must have processed ONLY the new
        # files — its batches carry exactly the update docs
        delta_rows = spark.read.parquet(out).where(
            ~F.col("batch").isin(list(initial_batches))
        )
        res["delta_exactly_once"] = bool(
            delta_rows.select("doc_id").distinct().count() == n_upd
        )

        compacted, t_compact = timed(
            lambda: ingest.compact_deltas(spark, out, shard_size=1 << 13)
        )
        res["compact_sec"] = round(t_compact, 2)
        log(f"compact {t_compact:.1f}s")

        # reference: batch rebuild over the final corpus state
        final = docs.where(F.col("doc_id") % 100 != 7).select(
            "doc_id", F.col("text").alias("content")
        ).union(upd.select("doc_id", "content")).persist()
        final.count()
        fresh_idx, t_rebuild = timed(
            lambda: build_index(
                final, analyzer="simple", shard_size=1 << 13,
                with_positions=False,
            )
        )
        res["rebuild_sec"] = round(t_rebuild, 2)
        # what one update cycle costs vs re-tokenizing + rebuilding the
        # world: delta tokenize (1% of docs) + compact (folds postings,
        # no tokenization) vs full ingest + compact
        res["update_cycle_sec"] = round(t_delta + t_compact, 2)
        res["full_cycle_sec"] = round(t_ingest + t_compact, 2)
        res["update_cycle_ratio"] = round(
            (t_delta + t_compact) / (t_ingest + t_compact + 1e-9), 3
        )
        log(f"rebuild {t_rebuild:.1f}s")

        ok_stats = (
            compacted.n_docs == fresh_idx.n_docs == n_docs
            and abs(compacted.avgdl - fresh_idx.avgdl) < 1e-9
        )
        res["stats_match"] = bool(ok_stats)

        rank_ok = True
        for name, q in [
            ("common", "id1x1 id2x2"),
            ("rare_or", "id19000x85 | id18500x70"),
            ("fresh", FRESH),
        ]:
            a = topk(compacted, q)
            b = topk(fresh_idx, q)
            rank_ok = rank_ok and a == b and len(a) > 0
        res["rank_identical_vs_rebuild"] = bool(rank_ok)

        # stale postings erased: updated docs contained id1x1 with ~97%
        # probability before the re-index, and ONLY updated docs carry
        # the fresh term — the conjunction must be empty
        stale = topk(compacted, f"{FRESH} id1x1")
        res["stale_postings_erased"] = stale == []
        # df bookkeeping agrees with the rebuild for old and fresh terms
        df_c = {
            r["term"]: r["df"]
            for r in compacted.terms.where(
                F.col("term").isin("id1x1", FRESH)
            ).collect()
        }
        df_f = {
            r["term"]: r["df"]
            for r in fresh_idx.terms.where(
                F.col("term").isin("id1x1", FRESH)
            ).collect()
        }
        res["df_match"] = df_c == df_f and df_c.get(FRESH) == n_upd
        res["noise_probe_sec"].append(noise_probe())
        res["ok"] = bool(
            res["stats_match"]
            and res["rank_identical_vs_rebuild"]
            and res["stale_postings_erased"]
            and res["df_match"]
            and res["delta_exactly_once"]
        )
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000))
