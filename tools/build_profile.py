#!/usr/bin/env python
"""Stage-level profile of the index build at probe scale.

``build_index`` is lazy except for the corpus stats, so the probe's
original ``build_sec`` covered tokenize+invert+stats but NOT the SPIMI
shard encode (it materialized in the untimed persist).  This tool
times each build stage's materialization separately so optimization
goes where the time is:

  * ``invert``    — tokenize + map-side inversion (lean cache count);
  * ``doclens``   — dl projection + corpus stats;
  * ``terms``     — df/cf aggregation over exploded postings;
  * ``shards``    — explode → range-shuffle → SPIMI compress;
  * ``shard_dl``  — per-shard doclen blobs.

Prints ONE JSON line.  Run: python tools/build_profile.py [n_docs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import noise_probe  # noqa: E402
from limetrans_spark.operators.build import build_index  # noqa: E402
from limetrans_spark.session import get_spark  # noqa: E402
from limetrans_spark.sources.corpus import rich_corpus  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main(n_docs: int = 1_000_000) -> int:
    res = {"metric": "build-profile", "n_docs": n_docs,
           "noise_probe_sec": [noise_probe()]}
    spark = get_spark(
        app_name="build-profile",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = rich_corpus(spark, n_docs, vocab=20_000, partitions=32).persist()
    docs.count()

    stages = {}
    # build_index eagerly runs corpus_stats (which materializes the lean
    # tokenize+invert cache) — time that as invert+stats combined, then
    # each lazy artifact separately
    idx, stages["invert_and_stats"] = timed(
        lambda: build_index(docs, text_col="text", analyzer="simple",
                            shard_size=1 << 13)
    )
    _, stages["postings_cache"] = timed(lambda: idx.postings.persist().count())
    _, stages["terms"] = timed(lambda: idx.terms.persist().count())
    _, stages["shards"] = timed(lambda: idx.shards.persist().count())
    _, stages["shard_dl"] = timed(lambda: idx.shard_dl.persist().count())
    _, stages["doclens_cache"] = timed(lambda: idx.doclens.persist().count())
    total = sum(stages.values())
    res["stages_sec"] = {k: round(v, 2) for k, v in stages.items()}
    res["full_build_sec"] = round(total, 2)
    res["full_build_docs_per_sec"] = round(n_docs / total, 1)
    res["n_postings"] = idx.postings.count()
    res["n_shard_rows"] = idx.shards.count()
    res["noise_probe_sec"].append(noise_probe())
    res["noise_probe_sec"] = [round(x, 4) for x in res["noise_probe_sec"]]
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sys.exit(main(n))
