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


def ivf_build(
    df: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """Build the IVF coarse quantizer: one centroid (per-dimension mean)
    per cluster → tiny ``(cluster, centroid)`` table, n_clusters rows.

    This is the *build-time* half of IVF: compute once per snapshot,
    persist next to the index, and at query time touch ONLY this table
    to pick clusters — never the corpus.  (A full deployment seeds the
    clusters with k-means; the engine takes assignments as given via
    ``cluster_col`` and derives centroids, which is the part that
    matters for pruning correctness.)
    """
    e = df.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(_as_double(F.col(vec_col))).alias("dim", "v"),
    )
    per_dim = e.groupBy("cluster", "dim").agg(F.avg("v").alias("c"))
    return per_dim.groupBy("cluster").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "label",
    exclude_id: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF pruned cosine top-k → (id, cosine).

    Probe selection runs against the **centroid table only** (n_clusters
    rows — a driver-side collect of ``nprobe`` ids), then the corpus scan
    is filtered to the probed clusters: on a cluster-partitioned table
    that ``IN`` filter is pure partition pruning, so query cost is
    ~nprobe/nclusters of the data instead of a full scan.  Pass the
    build-time ``centroids`` table; if omitted it is derived on the fly
    (fine for tests, wasteful at scale — that's the build-time half).
    """
    if centroids is None:
        centroids = ivf_build(df, vec_col=vec_col, cluster_col=cluster_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_rows = (
        centroids.select(
            "cluster", F.round(cosine_expr(F.col("centroid"), q), 9).alias("cs")
        )
        .orderBy(F.col("cs").desc(), F.col("cluster").asc())
        .limit(nprobe)
        .collect()
    )
    probed = [r["cluster"] for r in probe_rows]
    out = df.filter(F.col(cluster_col).isin(probed)).select(
        F.col(id_col).alias("id"),
        cosine_expr(_as_double(F.col(vec_col)), q).alias("cos_raw"),
    )
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    return (
        out.orderBy(F.col("cos_raw").desc(), F.col("id").asc())
        .limit(k)
        .select("id", F.round("cos_raw", 6).alias("cosine"))
    )
