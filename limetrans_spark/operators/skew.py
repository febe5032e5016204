"""Explicit skew handling: salted two-phase aggregation and skew-aware
join salting.

The index build handles its own skew structurally (doc-sharding bounds
any reducer at shard_size postings per term, ``operators/build.py``);
this module packages the *general-purpose* techniques the north rule
names — explicit salting/repartitioning of skewed high-frequency keys —
for the analytics side of the engine, where a groupBy on a zipfian key
(event type, hot user, stop-like token) funnels one key's rows through
one reducer.

``salted_agg`` is exact for algebraic aggregates (sum/count/min/max):
phase 1 aggregates ``(key, salt)`` partials — the hot key's rows spread
over ``n_salts`` reducers — phase 2 merges the ≤ n_salts partial rows
per key.  AQE's skew handling only splits *join* partitions; a skewed
aggregation key needs this two-phase shape.

``salted_broadcast_left`` handles the join case AQE can't: a broadcast
join is already skew-immune (no shuffle of the big side), so the helper
exists for the sort-merge fallback where the small side must be
replicated per salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# phase-1 partial / phase-2 merge pairs for the algebraic aggregates
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Exact two-phase aggregation with a salted first phase.

    ``aggs``: output column → (fn, input column) with fn in
    ``sum | count | min | max`` (the algebraic set — mean/variance
    decompose into these; non-algebraic aggregates like exact distinct
    need a different plan).  Example::

        salted_agg(events, ["event_type"],
                   {"n": ("count", "*"), "total": ("sum", "value")})

    Phase 1 groups by (keys…, salt) with salt =
    ``pmod(spark_partition_id, n_salts)`` — RNG-free, no column
    dependency, deterministic per scan split, and it spreads a hot key
    across reducers exactly when its rows span many input partitions
    (the only case where one reducer would otherwise drown).  Phase 2
    merges the ≤ n_salts partials per key.
    """
    for fn, _ in aggs.values():
        if fn not in _MERGES:
            raise ValueError(f"unsupported aggregate {fn!r} (algebraic only)")
    salt = F.pmod(F.spark_partition_id(), F.lit(n_salts)).alias("_salt")
    phase1_aggs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
        else:
            phase1_aggs.append(getattr(F, fn)(col).alias(out))
    p1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    merge_aggs = [_MERGES[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    return p1.groupBy(*keys).agg(*merge_aggs)


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join for a sort-merge situation: salt the big
    side's key, replicate the small side once per salt value, join on
    (key, salt) — the hot key's rows land on ``n_salts`` reducers
    instead of one.  (Prefer ``F.broadcast(small)`` outright when the
    small side fits; this is the fallback shape when it does not.)"""
    bigs = big.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    smalls = small.crossJoin(F.broadcast(salts))
    return bigs.join(smalls, [key, "_salt"]).drop("_salt")
