"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline (one scan + one global
top-k — ``TakeOrderedAndProject``, no full sort).  The scale path is an
IVF-style pruned search: score coarse clusters first, then scan only the
best ``nprobe`` clusters — at 1000 executors that turns a full-corpus
scan into a partition-pruned scan of ~nprobe/nclusters of the data.

All vector math is float64 ``F.aggregate``/``F.zip_with`` — JVM-side,
no Python in the hot path; results are engine-portable (checked against
a DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k → (id, cosine), ties by id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = df.select(
        F.col(id_col).alias("id"),
        F.round(cosine_expr(_as_double(F.col(vec_col)), q), 6).alias("cosine"),
    )
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    return out.orderBy(F.col("cosine").desc(), F.col("id").asc()).limit(k)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "label",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF-style pruned cosine top-k → (id, cosine).

    Coarse quantizer = the ``cluster_col`` partitioning (precomputed
    cluster assignments; k-means at build time in a full deployment).
    Cluster score = mean cosine(query, member) — a deterministic,
    engine-portable stand-in for centroid distance.  Only the best
    ``nprobe`` clusters are scanned, which on a cluster-partitioned
    table is pure partition pruning.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sims = df.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).alias("cluster"),
        cosine_expr(_as_double(F.col(vec_col)), q).alias("cos_raw"),
    )
    if exclude_id is not None:
        sims = sims.filter(F.col("id") != exclude_id)
    sims = sims.persist()
    best = (
        sims.groupBy("cluster")
        .agg(F.avg("cos_raw").alias("cscore"))
        .orderBy(F.col("cscore").desc(), F.col("cluster").asc())
        .limit(nprobe)
    )
    return (
        sims.join(F.broadcast(best.select("cluster")), "cluster", "left_semi")
        .select("id", F.round(F.col("cos_raw"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )
