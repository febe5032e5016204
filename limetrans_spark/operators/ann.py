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

import numpy as np
import pandas as pd
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


def ivf_train(
    df: DataFrame,
    k: int = 16,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """Deterministic Lloyd's k-means for corpora WITHOUT precomputed
    cluster labels → (centroids, assignments ``(id, label)``).

    Build-time only.  Determinism: initial centroids are the vectors of
    the ``k`` smallest ids (no RNG, no partition-order dependence);
    assignment is an Arrow-batched NumPy argmin against the broadcast
    centroid matrix (one matmul per batch — never per-row Python);
    update is one per-(cluster, dim) mean aggregation; empty clusters
    keep their previous centroid.  Driver state is k×dim floats — tiny
    at any corpus size; each iteration is one scan + one small shuffle.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).persist()
    seeds = v.orderBy("id").limit(k).collect()
    cents = np.asarray([r["v"] for r in seeds], dtype=np.float64)

    def assign_df(c: np.ndarray) -> DataFrame:
        cc = c.copy()

        @pandas_udf(T.IntegerType())
        def assign(vecs: pd.Series) -> pd.Series:
            m = np.asarray(vecs.tolist(), dtype=np.float64)  # (batch, dim)
            # ||x-c||² = ||x||² − 2x·c + ||c||²; ||x||² constant per row
            d = -2.0 * (m @ cc.T) + (cc * cc).sum(axis=1)[None, :]
            return pd.Series(np.argmin(d, axis=1).astype("int32"))

        return v.select("id", assign(F.col("v")).alias("label"), "v")

    for _ in range(n_iters):
        a = assign_df(cents)
        # exact decimal sums: double F.avg is reduction-order-dependent,
        # which would make centroids (hence assignments at ties) vary with
        # partitioning; quantize to 1e-12 and sum exactly instead, then
        # divide once in Python — bit-identical at any parallelism
        rows = (
            a.select("label", F.posexplode("v").alias("dim", "val"))
            .groupBy("label", "dim")
            .agg(
                F.sum(F.col("val").cast("decimal(30,12)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[int(r["label"]), int(r["dim"])] = float(r["s"]) / int(r["n"])
        cents = new
    final = assign_df(cents).select("id", "label")
    v.unpersist()
    return [[float(x) for x in c] for c in cents], final


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
