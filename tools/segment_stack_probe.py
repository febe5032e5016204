#!/usr/bin/env python
"""Segment-STACK probe at 1M docs — absorb FOUR successive update
batches as chained delta segments (``publish_delta_segment`` against
the previous segment, stats chained through ``merged_terms`` /
``merged_sum_dl``) and prove the stack served via
``SegmentedSearcher.from_chain`` is BIT-identical to one full rebuild
over the final corpus state.

Checks (assertions, not just timings):
  * per-batch absorb cost stays roughly flat with stack depth (the
    merged statistics are read from the previous segment, never
    recomputed from the base; the removal scan adds only column-pruned
    broadcast-semi scans of the small older deltas);
  * batch 3 RE-updates batch 1's docs and batch 4 deletes both a base
    doc and a delta-born doc — the live-version walk must subtract the
    right segment's contributions each time;
  * stacked top-20 == rebuilt top-20 (ids AND scores to 1e-9);
  * merged df is exact for old / re-removed / fresh terms.

Prints ONE JSON line; committed as BENCH/segment_stack_probe_r5_1M.json.

Run: python tools/segment_stack_probe.py [n_docs] (default 1_000_000)
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

QUERIES = [
    ("common_and", "id1x1 id2x2"),
    ("rare_or", "id19000x85 | id18500x70"),
    ("fresh1", "stackfresh1"),
    ("fresh4", "stackfresh4"),
    ("refresh_not", "stackfresh3 -stackfresh1"),
    ("prefix", "stackfre*"),
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
    res = {"metric": "segment-stack-probe", "n_docs": n_docs}
    res["noise_probe_sec"] = [noise_probe()]

    docs = rich_corpus(spark, n_docs, vocab=20_000, partitions=32).persist()
    docs.count()

    root = tempfile.mkdtemp(prefix="segment_stack_probe_")
    try:
        def build_publish_base():
            idx = build_index(
                docs, text_col="text", analyzer="simple", shard_size=1 << 13
            )
            return lc.save_index(idx, os.path.join(root, "base"), "probe", "g1")

        snap, t_base = timed(build_publish_base)
        res["base_build_publish_sec"] = round(t_base, 2)
        log(f"base build+publish {t_base:.1f}s")

        # four ~0.5% batches; batch 3 re-updates batch 1's residue, and
        # batch 4 deletes a base doc + a batch-1-born appended doc
        residues = [7, 107, 7, 57]
        final = docs.select("doc_id", "text")
        absorb = []
        for i, r in enumerate(residues, start=1):
            upd = docs.where(F.col("doc_id") % 200 == r).select(
                "doc_id",
                F.concat(
                    F.lit(f"stackfresh{i} body "),
                    (F.col("doc_id") % 31).cast("string"),
                ).alias("text"),
            )
            app = docs.where(F.col("doc_id") % 2000 == i).select(
                (F.col("doc_id") + i * n_docs).alias("doc_id"),
                F.concat(
                    F.lit(f"stackfresh{i} appended "),
                    (F.col("doc_id") % 17).cast("string"),
                ).alias("text"),
            )
            batch = upd.unionByName(app).persist()
            batch.count()
            deleted = None
            if i == 4:
                deleted = spark.createDataFrame(
                    [(11,), (n_docs + 2000 + 1,)], "doc_id long"
                )
            snap, t_abs = timed(
                lambda s=snap, b=batch, d=deleted: lc.publish_delta_segment(
                    spark, s, b, os.path.join(root, f"d{i}"), "probe",
                    f"s{i}", text_col="text", deleted_ids=d,
                )
            )
            absorb.append(round(t_abs, 2))
            log(f"absorb batch {i} (depth {i}) {t_abs:.1f}s")
            final = (
                final.join(batch.select("doc_id"), "doc_id", "left_anti")
                .unionByName(batch)
            )
            if deleted is not None:
                final = final.join(deleted, "doc_id", "left_anti")
            final = final.localCheckpoint()
        res["absorb_sec_per_depth"] = absorb
        res["absorb_flat_with_depth"] = bool(
            max(absorb) <= 2.5 * min(absorb)
        )

        seg, t_load = timed(lambda: SegmentedSearcher.from_chain(snap))
        res["stack_load_sec"] = round(t_load, 2)
        res["stack_depth"] = len(seg.searchers)

        def rebuild_publish():
            idx = build_index(
                final, text_col="text", analyzer="simple", shard_size=1 << 13
            )
            return lc.save_index(
                idx, os.path.join(root, "rebuild"), "probe", "g2"
            )

        re_snap, t_rebuild = timed(rebuild_publish)
        res["rebuild_publish_sec"] = round(t_rebuild, 2)
        res["total_absorb_vs_rebuild"] = round(sum(absorb) / t_rebuild, 3)
        full = LocalSearcher.from_snapshot(re_snap)
        log(
            f"rebuild {t_rebuild:.1f}s; 4 absorbs = "
            f"{res['total_absorb_vs_rebuild']}x one rebuild"
        )

        rank_ok = True
        warm_ms = {}
        for name, q in QUERIES:
            a = [(d, round(s, 9)) for d, s in full.search(q, k=20)]
            b = [(d, round(s, 9)) for d, s in seg.search(q, k=20)]
            rank_ok = rank_ok and a == b
            t0 = time.time()
            for _ in range(10):
                seg.search(q, k=10)
            warm_ms[name] = round((time.time() - t0) / 10 * 1000, 2)
        res["rank_identical_vs_rebuild"] = bool(rank_ok)
        res["stack_warm_ms"] = warm_ms
        log(f"stack warm {warm_ms}")

        # batch 1's fresh term must survive ONLY on docs batch 3 did
        # not re-update (residue 7 was re-updated wholesale) — i.e. on
        # batch 1's appends minus the batch-4 deletion
        res["superseded_erased"] = (
            seg.search("stackfresh1 body", k=10) == []
        )
        res["merged_df_exact"] = all(
            seg.delta.term_df.get(t, 0) == full.term_df.get(t, 0)
            for t in ("id1x1", "stackfresh1", "stackfresh3", "stackfresh4")
        )

        # checkIndex over the stack: recompute the final state's df/cf/
        # N/Σdl from the segments' own postings (tombstone-aware walk)
        # and compare against the chained exactly-merged statistics —
        # the trust gate a lifecycle script would run before aliasing
        chk, t_chk = timed(lambda: lc.check_segments(spark, snap))
        res["check_segments_sec"] = round(t_chk, 2)
        res["check_segments_ok"] = bool(chk["ok"])
        log(f"check_segments {t_chk:.1f}s ok={chk['ok']}")

        # deep mode decodes EVERY compressed run in all 5 segments'
        # serving artifacts — checkIndex's postings-level scan
        dchk, t_deep = timed(lambda: lc.check_segments(spark, snap, deep=True))
        res["check_deep_sec"] = round(t_deep, 2)
        res["check_deep_postings"] = sum(
            d["postings"] for d in dchk["deep"]["per_segment"]
        )
        res["check_deep_ok"] = bool(
            dchk["ok"] and dchk["deep"]["violations"] == 0
        )
        log(
            f"deep check {t_deep:.1f}s, {res['check_deep_postings']} "
            f"postings decoded, ok={res['check_deep_ok']}"
        )

        res["noise_probe_sec"].append(noise_probe())
        res["ok"] = bool(
            res["rank_identical_vs_rebuild"]
            and res["superseded_erased"]
            and res["merged_df_exact"]
            and res["stack_depth"] == 5
            and res["check_segments_ok"]
            and res["check_deep_ok"]
        )
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000))
