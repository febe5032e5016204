#!/usr/bin/env python
"""Fielded-search probe at 1M docs — the multi-field surface
(per-field analyzers, copy_to catch-all, cross-field composition) at
200× the driver's gate scale.

Corpus: three deterministic fields derived from the rich corpus —
``title`` (first 8 tokens, simple), ``body`` (full text, Porter-stemmed
— the stemmer runs over every token of 1M docs), ``author``
(synthetic 5000-name keyspace, simple) — plus a ``catch`` copy_to
target over title+author, mirroring the reference's per-field-analyzer
+ catch-all layout (hbztitle-settings-v8.json).

Checks (assertions, not just timings):
  * rank identity, scores to 1e-9 at k=20, between the Spark sharded
    WAND tier (``bm25_topk_fielded_sharded``) and the Spark-free
    serving replica (``LocalFieldedSharded.from_snapshot``) on
    single-field, stemmed-field, cross-field, catch-all, and
    fielded-phrase queries — every query must also MATCH something;
  * the stemmed body field actually stems at scale (a query in surface
    form hits documents via the stemmed index).

Prints ONE JSON line; the transcript is committed as
BENCH/fielded_probe_r5_1M.json.

Run: python tools/fielded_probe.py [n_docs] (default 1_000_000)
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
from limetrans_spark.operators import fielded as FL  # noqa: E402
from limetrans_spark.plans import lifecycle as lc  # noqa: E402
from limetrans_spark.session import get_spark  # noqa: E402
from limetrans_spark.sources.corpus import rich_corpus  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


QUERIES = [
    ("single_field", "title:id1x1"),
    ("author_exact", "author:author123"),
    ("cross_field", "title:id1x1 body:id2x2"),
    ("catch_all", "catch:id1x1 | catch:author123"),
    ("stemmed_surface", "body:licenses"),  # stems to 'licens' at index+query
]


def main(n_docs: int = 1_000_000) -> int:
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    res = {"metric": "fielded-probe", "n_docs": n_docs}
    res["noise_probe_sec"] = [noise_probe()]

    docs = (
        rich_corpus(spark, n_docs, vocab=20_000, partitions=32)
        .select(
            "doc_id",
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias(
                "title"
            ),
            F.col("text").alias("body"),
            F.concat(F.lit("author"), (F.col("doc_id") % 5000)).alias("author"),
        )
        .persist()
    )
    _, t_gen = timed(docs.count)
    res["gen_sec"] = round(t_gen, 2)

    fields = {
        "title": ("title", "simple"),
        "body": ("body", "simple_stem"),
        "author": ("author", "simple"),
    }
    idx, t_build = timed(
        lambda: FL.build_fielded_sharded(
            docs,
            fields,
            copy_to={"title": ["catch"], "author": ["catch"]},
            shard_size=1 << 13,
        )
    )
    res["build_sec"] = round(t_build, 2)
    res["build_docs_per_sec"] = round(n_docs / t_build, 1)
    log(f"fielded build (3 fields + copy_to) {t_build:.1f}s")
    # cache the per-field artifacts so tier-identity timings measure
    # query work, not per-query re-encoding (same policy as bench.py)
    for f_idx in idx.values():
        f_idx.shards.persist().count()
        f_idx.terms.persist().count()

    root = tempfile.mkdtemp(prefix="fielded_probe_")
    try:
        _, t_save = timed(lambda: lc.save_fielded(idx, root, "probe", "g1"))
        res["save_sec"] = round(t_save, 2)
        repl, t_load = timed(lambda: FL.LocalFieldedSharded.from_snapshot(root))
        res["serve_load_sec"] = round(t_load, 2)
        log(f"save {t_save:.1f}s serve load {t_load:.1f}s")

        rank_ok = True
        q_wall = {}
        for name, q in QUERIES:
            a, t_spark = timed(
                lambda q=q: [
                    (r.doc_id, round(r.score, 9))
                    for r in FL.bm25_topk_fielded_sharded(idx, q, k=20).collect()
                ]
            )
            b = [(d, round(s, 9)) for d, s in repl.search(q, k=20)]
            rank_ok = rank_ok and a == b and len(a) > 0
            q_wall[name] = {"spark_sec": round(t_spark, 2), "n_hits": len(a)}
        res["queries"] = q_wall
        res["rank_identical"] = bool(rank_ok)

        serve_ms = {}
        for name, q in QUERIES:
            repl.search(q, k=10)
            t0 = time.time()
            for _ in range(20):
                repl.search(q, k=10)
            serve_ms[name] = round((time.time() - t0) / 20 * 1000, 2)
        res["serve_warm_ms"] = serve_ms
        log(f"serve warm {serve_ms}")

        res["stemming_active"] = bool(
            q_wall["stemmed_surface"]["n_hits"] > 0
        )
        res["noise_probe_sec"].append(noise_probe())
        res["ok"] = bool(res["rank_identical"] and res["stemming_active"])
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000))
