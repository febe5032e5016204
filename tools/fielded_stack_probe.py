#!/usr/bin/env python
"""Fielded segment-stack probe at 1M docs — TWO successive update
batches absorbed as per-field delta segments
(``publish_fielded_delta_segment`` chained), served via
``SegmentedFielded.from_chain``, then folded with
``compact_fielded_segments`` — both proven BIT-identical to a fielded
rebuild over the final corpus state, at 200× the driver's gate scale.

Corpus/fields mirror ``fielded_probe.py``: title (simple), body
(Porter-stemmed), author (5000-name keyspace), catch = copy_to of
title+author.

Checks (assertions, not just timings):
  * stack top-20 == rebuilt top-20 (ids AND scores to 1e-9) on
    single-field / stemmed / cross-field / catch-all / fresh-term /
    re-update shapes — batch 2 re-updates half of batch 1's docs and
    deletes a base doc, so the per-field merged statistics must chain
    and the shared tombstones must stack;
  * compact(stack) == stack on the same shapes (the compacted tree
    reconstructs corpus rows by joining per-field docstores);
  * per-field merged df is exact vs the rebuilt tree.

Prints ONE JSON line; committed as BENCH/fielded_stack_probe_r5_1M.json.

Run: python tools/fielded_stack_probe.py [n_docs] (default 1_000_000)
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

FIELDS = {
    "title": ("title", "simple"),
    "body": ("body", "simple_stem"),
    "author": ("author", "simple"),
}
COPY = {"title": ["catch"], "author": ["catch"]}

QUERIES = [
    ("single_field", "title:id1x1"),
    ("stemmed_surface", "body:licenses"),
    ("cross_field", "title:id1x1 body:id2x2"),
    ("catch_all", "catch:id1x1 | catch:author123"),
    ("fresh1", "title:fstackone"),
    ("fresh2", "body:fstacktwo"),
    ("refresh_not", "title:fstackone -body:fstacktwo"),
]


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fieldize(df):
    return df.select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias(
            "title"
        ),
        F.col("text").alias("body"),
        F.concat(F.lit("author"), (F.col("doc_id") % 5000)).alias("author"),
    )


def main(n_docs: int = 1_000_000) -> int:
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    res = {"metric": "fielded-stack-probe", "n_docs": n_docs}
    res["noise_probe_sec"] = [noise_probe()]

    docs = fieldize(rich_corpus(spark, n_docs, vocab=20_000, partitions=32)).persist()
    docs.count()

    root = tempfile.mkdtemp(prefix="fielded_stack_probe_")
    try:
        def publish_base():
            idxs = FL.build_fielded_sharded(
                docs, FIELDS, copy_to=COPY, shard_size=1 << 13
            )
            return lc.save_fielded(idxs, os.path.join(root, "base"), "p", "g1")

        _, t_base = timed(publish_base)
        res["base_build_publish_sec"] = round(t_base, 2)
        log(f"fielded base build+publish {t_base:.1f}s")

        # batch 1: 0.5% title updates + 0.05% appends
        b1 = (
            docs.where(F.col("doc_id") % 200 == 7)
            .withColumn("title", F.lit("fstackone fresh"))
            .unionByName(
                docs.where(F.col("doc_id") % 2000 == 1).select(
                    (F.col("doc_id") + n_docs).alias("doc_id"),
                    F.lit("fstackone appended").alias("title"),
                    "body", "author",
                )
            )
            .persist()
        )
        b1.count()
        _, t1 = timed(
            lambda: lc.publish_fielded_delta_segment(
                spark, os.path.join(root, "base"), b1,
                os.path.join(root, "d1"), "p", "s1",
                fields=FIELDS, copy_to=COPY,
            )
        )
        res["absorb1_sec"] = round(t1, 2)
        log(f"fielded absorb 1 {t1:.1f}s")

        # batch 2: re-update half of batch 1's residue (body this time)
        # + delete one base doc and one batch-1-born doc
        b2 = (
            docs.where(F.col("doc_id") % 400 == 7)
            .withColumn("body", F.lit("fstacktwo merged body"))
            .persist()
        )
        b2.count()
        deleted = spark.createDataFrame(
            [(11,), (n_docs + 2000 + 1,)], "doc_id long"
        )
        _, t2 = timed(
            lambda: lc.publish_fielded_delta_segment(
                spark, os.path.join(root, "d1"), b2,
                os.path.join(root, "d2"), "p", "s2",
                fields=FIELDS, copy_to=COPY, deleted_ids=deleted,
            )
        )
        res["absorb2_sec"] = round(t2, 2)
        log(f"fielded absorb 2 {t2:.1f}s")

        stack, t_load = timed(
            lambda: FL.SegmentedFielded.from_chain(os.path.join(root, "d2"))
        )
        res["stack_load_sec"] = round(t_load, 2)

        # final corpus state + rebuild
        final = (
            docs.join(b1.select("doc_id"), "doc_id", "left_anti")
            .unionByName(b1)
            .join(b2.select("doc_id"), "doc_id", "left_anti")
            .unionByName(b2)
            .join(deleted, "doc_id", "left_anti")
            .persist()
        )
        final.count()

        def rebuild():
            idxs = FL.build_fielded_sharded(
                final, FIELDS, copy_to=COPY, shard_size=1 << 13
            )
            return lc.save_fielded(idxs, os.path.join(root, "re"), "p", "g2")

        _, t_re = timed(rebuild)
        res["rebuild_publish_sec"] = round(t_re, 2)
        res["total_absorb_vs_rebuild"] = round((t1 + t2) / t_re, 3)
        full = FL.LocalFieldedSharded.from_snapshot(os.path.join(root, "re"))
        log(
            f"fielded rebuild {t_re:.1f}s; 2 absorbs = "
            f"{res['total_absorb_vs_rebuild']}x one rebuild"
        )

        rank_ok = True
        warm_ms = {}
        for name, q in QUERIES:
            a = [(d, round(s, 9)) for d, s in full.search(q, k=20)]
            b = [(d, round(s, 9)) for d, s in stack.search(q, k=20)]
            rank_ok = rank_ok and a == b
            t0 = time.time()
            for _ in range(10):
                stack.search(q, k=10)
            warm_ms[name] = round((time.time() - t0) / 10 * 1000, 2)
        res["rank_identical_vs_rebuild"] = bool(rank_ok)
        res["stack_warm_ms"] = warm_ms
        log(f"fielded stack warm {warm_ms}")

        res["merged_df_exact"] = all(
            stack.delta.searchers[f].term_df.get(t, 0)
            == full.searchers[f].term_df.get(t, 0)
            for f, t in (
                ("title", "fstackone"), ("body", "fstacktwo"),
                ("title", "id1x1"), ("catch", "author123"),
            )
        )

        # compaction of the fielded stack
        _, t_cc = timed(
            lambda: lc.compact_fielded_segments(
                spark, os.path.join(root, "d2"), os.path.join(root, "cc"),
                "p", "g3", fields=FIELDS, copy_to=COPY,
            )
        )
        res["compact_sec"] = round(t_cc, 2)
        cc = FL.LocalFieldedSharded.from_snapshot(os.path.join(root, "cc"))
        res["compact_rank_identical"] = all(
            [(d, round(s, 9)) for d, s in cc.search(q, k=20)]
            == [(d, round(s, 9)) for d, s in stack.search(q, k=20)]
            for _, q in QUERIES
        )
        log(f"fielded compact {t_cc:.1f}s")

        # fielded checkIndex: every field's stack vs its merged stats
        # plus the equal-depth / shared-tombstone invariants
        chk, t_chk = timed(
            lambda: lc.check_fielded_segments(spark, os.path.join(root, "d2"))
        )
        res["check_fielded_sec"] = round(t_chk, 2)
        res["check_fielded_ok"] = bool(chk["ok"])
        log(f"check_fielded_segments {t_chk:.1f}s ok={chk['ok']}")

        res["noise_probe_sec"].append(noise_probe())
        res["ok"] = bool(
            res["rank_identical_vs_rebuild"]
            and res["merged_df_exact"]
            and res["compact_rank_identical"]
            and res["check_fielded_ok"]
        )
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000))
