#!/usr/bin/env python
"""Stage-level profile of the sharded BM25 query path at probe scale.

The 1M-doc probe (BENCH/scale_probe_r5_1M.json) shows the sharded tier
at 5.5 s on a two-common-term query — far above the per-shard NumPy
work (decode + TAAT over 8192-doc shards is sub-ms).  This tool breaks
one query into its Spark stages so optimization goes where the time is:

  * ``terms_lookup`` — the per-query ``index.terms.filter(isin).collect()``
    df-stats job;
  * ``shards_scan`` — ``index.shards.filter(term isin).count()``: the
    cached-columnar scan that prunes the posting rows;
  * ``cold`` / ``warm`` (best-of-3) — the full ``bm25_topk_sharded``
    call, so (cold − warm) exposes codegen/first-touch cost and
    (warm − scan − lookup) is the cogroup + applyInPandas + merge.

Prints ONE JSON line.  Run: python tools/query_profile.py [n_docs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import noise_probe  # noqa: E402
from limetrans_spark.operators import query as Q  # noqa: E402
from limetrans_spark.operators.build import build_index  # noqa: E402
from limetrans_spark.session import get_spark  # noqa: E402
from limetrans_spark.sources.corpus import rich_corpus  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main(n_docs: int = 1_000_000) -> int:
    res = {"metric": "query-profile", "n_docs": n_docs,
           "noise_probe_sec": [noise_probe()]}
    spark = get_spark(
        app_name="query-profile",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = rich_corpus(spark, n_docs, vocab=20_000, partitions=32).persist()
    docs.count()
    idx, t_build = timed(
        lambda: build_index(docs, text_col="text", analyzer="simple",
                            shard_size=1 << 13)
    )
    for df in (idx.postings, idx.shards, idx.terms, idx.doclens):
        df.persist().count()
    res["build_sec"] = round(t_build, 2)
    res["n_shard_rows"] = idx.shards.count()

    out = {}
    for name, qstr in [
        ("common", "id1x1 id2x2"),
        ("rare_or", "id19000x85 | id18500x70"),
    ]:
        pq = Q.parse_query(qstr, analyze=Q.query_analyzer_for(idx))
        terms = sorted({t for g in pq.groups for c in g for t in c.terms})
        stage = {}
        _, stage["terms_lookup"] = timed(
            lambda: idx.terms.filter(F.col("term").isin(terms)).collect()
        )
        _, stage["shards_scan"] = timed(
            lambda: idx.shards.filter(F.col("term").isin(terms)).count()
        )
        sizes = (
            idx.shards.filter(F.col("term").isin(terms))
            .agg(
                F.sum(F.octet_length("doc_blob")).alias("doc_b"),
                F.sum(F.octet_length("tf_blob")).alias("tf_b"),
                F.sum(F.octet_length("pos_blob")).alias("pos_b"),
            )
            .collect()[0]
        )
        stage["bytes"] = {
            "doc_blob": int(sizes["doc_b"] or 0),
            "tf_blob": int(sizes["tf_b"] or 0),
            "pos_blob": int(sizes["pos_b"] or 0),
        }
        _, stage["cold"] = timed(
            lambda: Q.bm25_topk_sharded(idx, qstr, k=20).collect()
        )
        warm = []
        for _ in range(3):
            _, dt = timed(lambda: Q.bm25_topk_sharded(idx, qstr, k=20).collect())
            warm.append(dt)
        stage["warm_best3"] = min(warm)
        stage["warm_all"] = warm
        out[name] = {
            k: (round(v, 3) if isinstance(v, float)
                else [round(x, 3) for x in v] if isinstance(v, list)
                else v)
            for k, v in stage.items()
        }
    res["queries"] = out
    res["noise_probe_sec"].append(noise_probe())
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sys.exit(main(n))
