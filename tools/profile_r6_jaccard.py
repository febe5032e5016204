"""Round-6 profile: where does dedup_jaccard_3gram spend its time at sf1.0?

Splits the jaccard_pairs(ngram=3, threshold=0.2, ceiling=n/20) plan into
its stages and times each with a noop sink (guide §1.4), labeling jobs
(§1.5).  Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from limetrans_spark.operators import dedup  # noqa: E402
from limetrans_spark.operators.dedup import _token_sets  # noqa: E402
from limetrans_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    return out, round(dt, 3)


def main():
    spark = get_spark(
        app_name="profile-jaccard-r6",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    ceiling = max(16, n // 20)
    res = {"n_docs": n, "ceiling": ceiling}

    # stage A: shingle token sets (explode distinct 3-gram shingles)
    toks_all = _token_sets(docs, "text", "doc_id", ngram=3)
    _, res["A_token_sets_noop"] = timed("A token_sets", lambda: noop(toks_all), spark)
    res["A_rows"] = toks_all.count()

    toks_all = toks_all.persist()
    toks_all.count()

    # stage B: dfreq + semi-join prune (on the persisted token relation)
    dfreq = toks_all.groupBy("term").agg(F.count("*").alias("df"))
    keep = dfreq.filter(F.col("df") <= ceiling).select("term")
    _, res["B_dfreq_noop"] = timed("B dfreq", lambda: noop(dfreq), spark)
    res["B_n_terms"] = dfreq.count()
    res["B_pruned"] = dfreq.filter(F.col("df") > ceiling).count()
    toks = toks_all.join(keep, "term", "left_semi")
    _, res["C_semijoin_noop"] = timed("C semijoin", lambda: noop(toks), spark)
    res["C_kept_rows"] = toks.count()
    toksp = toks.persist()
    toksp.count()

    # pair volume: sum df^2 over kept terms
    kd = dfreq.filter(F.col("df") <= ceiling)
    res["pair_rows_est"] = kd.select(
        F.sum(F.col("df") * (F.col("df") - 1) / 2)
    ).first()[0]

    # stage D: the self-join + pair aggregation from the persisted toks
    sizes = toksp.groupBy("id").agg(F.count("*").alias("sz"))
    toks_sz = toksp.join(sizes, "id")
    a, b = toks_sz.alias("a"), toks_sz.alias("b")
    pair_cond = (
        (F.col("a.term") == F.col("b.term"))
        & (F.col("a.id") < F.col("b.id"))
        & (
            F.least(F.col("a.sz"), F.col("b.sz")).cast("double")
            / F.greatest(F.col("a.sz"), F.col("b.sz")).cast("double")
            >= F.lit(0.2)
        )
    )
    out = (
        a.join(b, pair_cond)
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("inter"))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    _, res["D_join_agg_noop"] = timed("D join+agg", lambda: noop(out), spark)
    res["D_out_rows"] = out.count()

    # full end-to-end call for reference (the bench's shape)
    spark.catalog.clearCache()
    t0 = time.time()
    full = dedup.jaccard_pairs(docs, threshold=0.2, ngram=3, max_token_df=ceiling)
    full.collect()
    res["full_e2e"] = round(time.time() - t0, 3)
    full.unpersist()

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
