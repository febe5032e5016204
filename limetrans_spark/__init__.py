"""limetrans_spark — PySpark-native inverted-index + BM25 engine.

Public surface (see README.md for the architecture):

>>> from limetrans_spark import get_spark, build_index, bm25_topk_df
>>> spark = get_spark()
>>> idx = build_index(corpus_df)               # corpus: repo/path/commit/lang/content
>>> bm25_topk_df(idx, '"block max wand" -license tokeni*', k=10).show()
"""

from .operators.build import BuiltIndex, assign_doc_ids, build_index
from .operators.fielded import (
    FieldedIndex,
    LocalFieldedSearcher,
    bm25_topk_fielded,
    bm25_topk_fielded_sharded,
    build_fielded_index,
    build_fielded_sharded,
    parse_fielded_query,
)
from .operators.query import (
    MAX_HITS,
    bm25_topk_df,
    bm25_topk_sharded,
    matching_docs_df,
    parse_query,
)
from .operators.fielded import SegmentedFielded
from .operators.serve import (
    LocalSearcher,
    SegmentedSearcher,
    SnapshotWatcher,
    merge_topk,
)
from .plans.lifecycle import (
    apply_deletes,
    build_and_publish,
    check_fielded_segments,
    check_index,
    check_segments,
    compact_fielded_segments,
    compact_segments,
    load_index,
    publish_delta_segment,
    publish_fielded_delta_segment,
    retain_snapshots,
    save_index,
    switch_alias,
)
from .session import get_spark

__all__ = [
    "MAX_HITS",
    "BuiltIndex",
    "FieldedIndex",
    "LocalFieldedSearcher",
    "LocalSearcher",
    "SegmentedFielded",
    "SegmentedSearcher",
    "SnapshotWatcher",
    "merge_topk",
    "check_fielded_segments",
    "check_index",
    "check_segments",
    "compact_fielded_segments",
    "compact_segments",
    "publish_delta_segment",
    "publish_fielded_delta_segment",
    "apply_deletes",
    "assign_doc_ids",
    "bm25_topk_df",
    "bm25_topk_fielded",
    "bm25_topk_fielded_sharded",
    "bm25_topk_sharded",
    "build_and_publish",
    "build_fielded_index",
    "build_fielded_sharded",
    "build_index",
    "get_spark",
    "load_index",
    "matching_docs_df",
    "parse_fielded_query",
    "parse_query",
    "retain_snapshots",
    "save_index",
    "switch_alias",
]
