"""Cross-record operators: link verification and parent-enrichment join.

Two reference operators that go beyond row-local transforms:

* ``verify_links`` — the Fix post-processor
  (``main/src/main/java/hbz/limetrans/function/VerifyLinks.java:112-197``):
  for each record's array of link identifiers, check membership against
  externally loaded reference-id sets and annotate with the verified
  subset + counts.  Spark shape: explode → left-semi join against the
  (possibly huge) reference table → re-nest.  No broadcast needed when
  the reference side is large — AQE picks the join strategy.

* ``super_join`` — the SISIS parent/child self-join
  (``core/src/main/java/hbz/limetrans/util/SisisSuperFilter.java:54-161``):
  each child record carries a parent reference id; replay the child
  enriched with selected fields from its parent.  Spark shape: a plain
  self-join (broadcast if the parent projection is small, sort-merge
  otherwise) — the reference buffers ALL records in memory to do this
  (``:54-66``), which is exactly what doesn't scale and what the join
  replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def verify_links(
    df: DataFrame,
    links_col: str,
    ref_ids: DataFrame,
    ref_id_col: str = "id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate each row with ``verified_<links_col>`` (the subset of its
    link ids present in ``ref_ids``) and ``n_verified`` / ``n_links``
    counts (VerifyLinks' verifying*/verified* arrays + per-path counters).
    """
    exploded = df.select(
        F.col(id_col).alias("_vid"), F.explode_outer(links_col).alias("_link")
    )
    hits = (
        exploded.join(
            ref_ids.select(F.col(ref_id_col).alias("_link")).distinct(),
            "_link",
            "left_semi",
        )
        .groupBy("_vid")
        .agg(F.sort_array(F.collect_list("_link")).alias(f"verified_{links_col}"))
    )
    out = (
        df.join(hits, df[id_col] == hits["_vid"], "left")
        .drop("_vid")
        .withColumn(
            f"verified_{links_col}",
            F.coalesce(F.col(f"verified_{links_col}"), F.array().cast("array<string>")),
        )
        .withColumn("n_links", F.size(F.coalesce(F.col(links_col), F.array())))
        .withColumn("n_verified", F.size(F.col(f"verified_{links_col}")))
    )
    return out


def super_join(
    df: DataFrame,
    ref_col: str,
    parent_id_col: str,
    graft_cols: dict[str, str],
    prefix: str | None = None,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Enrich child rows with parent fields via a self-join.

    ``graft_cols`` maps parent column → new child column; parent ids are
    optionally emitted with ``prefix`` (the reference prepends
    ``(DE-600)`` to super ids, SisisSuperFilter.java:139-145).

    ``broadcast_parent`` defaults to False: the parent side is a
    projection of the whole corpus, so forcing a broadcast is a driver
    OOM at scale — AQE picks broadcast on its own when the projection
    turns out small.  Pass True only for a known-small parent set.
    """
    parent = df.select(
        F.col(parent_id_col).alias("_pid"),
        *[F.col(src).alias(dst) for src, dst in graft_cols.items()],
    )
    if broadcast_parent:
        parent = F.broadcast(parent)
    out = df.join(parent, df[ref_col] == parent["_pid"], "left").drop("_pid")
    if prefix is not None:
        out = out.withColumn(
            "super_id",
            F.when(
                F.col(ref_col).isNotNull(), F.concat(F.lit(prefix), F.col(ref_col))
            ),
        )
    return out
