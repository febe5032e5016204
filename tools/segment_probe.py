#!/usr/bin/env python
"""Delta-segment update probe at 1M docs — absorb a 1% update batch as
a Lucene-style segment (``lifecycle.publish_delta_segment`` +
``serve.SegmentedSearcher``) and prove the served results are
BIT-identical to a full rebuild over the final corpus state, at 200×
the driver's gate scale.

Checks (assertions, not just timings):
  * segmented top-20 == rebuilt top-20 (ids AND scores to 1e-9) on
    common-AND / rare-OR / fresh-term / NOT / prefix query shapes;
  * replaced docs' old postings are unreachable (fresh-term AND
    old-term conjunction confined to delta docs);
  * the merged statistics are exact: segmented and rebuilt searchers
    agree on df for old, removed-from, and fresh terms.

The headline numbers: wall to ABSORB the update (delta build + merged
stats + publish) vs wall to rebuild + republish the world — the
segment path's cost scales with the update size plus one column-pruned
scan of the base postings.

Prints ONE JSON line; committed as BENCH/segment_probe_r5_1M.json.

Run: python tools/segment_probe.py [n_docs] (default 1_000_000)
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
from limetrans_spark.operators.build import build_index  # noqa: E402
from limetrans_spark.operators.serve import (  # noqa: E402
    LocalSearcher,
    SegmentedSearcher,
)
from limetrans_spark.plans import lifecycle as lc  # noqa: E402
from limetrans_spark.session import get_spark  # noqa: E402
from limetrans_spark.sources.corpus import rich_corpus  # noqa: E402

FRESH = "segmentfreshterm"

QUERIES = [
    ("common_and", "id1x1 id2x2"),
    ("rare_or", "id19000x85 | id18500x70"),
    ("fresh", FRESH),
    ("mixed_not", "id1x1 -id17000x25"),
    ("prefix", "id1x*"),
]


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(n_docs: int = 1_000_000) -> int:
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    res = {"metric": "segment-probe", "n_docs": n_docs}
    res["noise_probe_sec"] = [noise_probe()]

    docs = rich_corpus(spark, n_docs, vocab=20_000, partitions=32).persist()
    _, t_gen = timed(docs.count)
    res["gen_sec"] = round(t_gen, 2)

    root = tempfile.mkdtemp(prefix="segment_probe_")
    try:
        # base generation
        def build_publish_base():
            idx = build_index(
                docs, text_col="text", analyzer="simple", shard_size=1 << 13
            )
            return lc.save_index(idx, os.path.join(root, "base"), "probe", "g1")

        base_snap, t_base = timed(build_publish_base)
        res["base_build_publish_sec"] = round(t_base, 2)
        log(f"base build+publish {t_base:.1f}s")

        # 1% replaced wholesale + 0.1% appended
        updated = docs.where(F.col("doc_id") % 100 == 7).select(
            "doc_id",
            F.concat(
                F.lit(FRESH + " " + FRESH + " tail"),
                (F.col("doc_id") % 37).cast("string"),
            ).alias("text"),
        )
        appended = docs.where(F.col("doc_id") % 1000 == 3).select(
            (F.col("doc_id") + n_docs).alias("doc_id"), "text"
        )
        delta_docs = updated.unionByName(appended).persist()
        n_delta = delta_docs.count()
        res["delta_docs"] = n_delta

        delta_snap, t_seg = timed(
            lambda: lc.publish_delta_segment(
                spark, base_snap, delta_docs,
                os.path.join(root, "delta"), "probe", "d1", text_col="text",
            )
        )
        res["segment_publish_sec"] = round(t_seg, 2)
        log(f"segment absorb (build+merge stats+publish) {t_seg:.1f}s")

        seg, t_segload = timed(
            lambda: SegmentedSearcher.from_snapshots(base_snap, delta_snap)
        )
        res["segment_load_sec"] = round(t_segload, 2)

        # reference: full rebuild over the final corpus state
        final = docs.where(F.col("doc_id") % 100 != 7).select(
            "doc_id", "text"
        ).unionByName(delta_docs).persist()
        final.count()

        def rebuild_publish():
            idx = build_index(
                final, text_col="text", analyzer="simple", shard_size=1 << 13
            )
            return lc.save_index(
                idx, os.path.join(root, "rebuild"), "probe", "g2"
            )

        re_snap, t_rebuild = timed(rebuild_publish)
        res["rebuild_publish_sec"] = round(t_rebuild, 2)
        res["absorb_vs_rebuild"] = round(t_seg / t_rebuild, 3)
        full = LocalSearcher.from_snapshot(re_snap)
        log(f"rebuild+publish {t_rebuild:.1f}s (segment = {res['absorb_vs_rebuild']}x)")

        rank_ok = True
        seg_ms = {}
        for name, q in QUERIES:
            a = [(d, round(s, 9)) for d, s in full.search(q, k=20)]
            b = [(d, round(s, 9)) for d, s in seg.search(q, k=20)]
            rank_ok = rank_ok and a == b and len(a) > 0
            t0 = time.time()
            for _ in range(10):
                seg.search(q, k=10)
            seg_ms[name] = round((time.time() - t0) / 10 * 1000, 2)
        res["rank_identical_vs_rebuild"] = bool(rank_ok)
        res["segment_warm_ms"] = seg_ms
        log(f"segment warm {seg_ms}")

        # stale-postings erasure + exact merged df
        stale = seg.search(f"{FRESH} id1x1", k=50)
        res["stale_postings_erased"] = stale == []
        df_pairs_ok = all(
            seg.base.term_df.get(t, 0) == full.term_df.get(t, 0)
            for t in ("id1x1", FRESH, "id17000x25")
        )
        res["merged_df_exact"] = bool(df_pairs_ok)

        res["noise_probe_sec"].append(noise_probe())
        res["ok"] = bool(
            res["rank_identical_vs_rebuild"]
            and res["stale_postings_erased"]
            and res["merged_df_exact"]
        )
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000))
