"""Capture .explain("formatted") for the round-6-touched queries.

Usage: python tools/capture_plans_r6.py <out_dir> [suffix]

Writes <out_dir>/<query>_<suffix>.txt for each query in TOUCHED.
Run from a tree with the desired code version on PYTHONPATH (round-start
checkout for *_before, HEAD for *_after).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402


TOUCHED = [
    "dedup_jaccard_3gram",
    "dedup_jaccard",
    "text_profile",
    "events_hourly_rollup",
    "tpch_q1",
    "dedup_embedding_lsh32",
    "dedup_simhash",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as entry
    from limetrans_spark.session import get_spark
    from limetrans_spark.operators import dedup as dd

    spark = get_spark(app_name="plans-r6", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in TOUCHED:
        if name == "dedup_embedding_lsh32":
            emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            df = dd.embedding_lsh_pairs(emb, threshold=0.8, n_planes=32, bands=4)
            if hasattr(df, "unpersist"):
                df.unpersist()
        elif name not in qs:
            continue
        else:
            df = qs[name](spark, SF_DIR)
            if hasattr(df, "unpersist"):
                df.unpersist()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
