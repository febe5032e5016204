"""Fielded (multi-field) search: per-field postings, copy_to derivation,
``field:term`` query syntax, per-field BM25 statistics.

The reference queries different fields with different semantics —
``cql.allIndexes`` (the catch-all every analyzed field copies into) vs
``bib.namePersonal`` (a specific source field); see the copy_to DAG in
``main/src/main/resources/elasticsearch/hbztitle-mapping-v8.json:33-37,
3070-3082`` and the fielded queries in
``main/src/test/java/hbz/limetrans/ElasticsearchQueryTest.java:57-61``.

Spark shape: ONE postings relation with a leading ``field`` column —
``(field, term, doc_id, tf)`` — so every per-field statistic (df, dl,
avgdl, docCount) is a groupBy away and a fielded query is a conjunction
of filters on ``(field, term)`` pairs over the same scan.  Scoring is
true per-field BM25 (each field is its own scoring space, as in
Lucene): idf from the field's df and docCount, length norm from the
field's dl/avgdl.

``copy_to`` unions the source fields' token streams into the target
field with a large per-source position gap (the position_increment_gap
idea) so phrases never match across source boundaries.

Three execution tiers, rank-identical for the shared query surface
(tested): the pure-Catalyst DataFrame path (:func:`bm25_topk_fielded`),
the serving tier (:class:`LocalFieldedSearcher`), and per-field
compressed doc-sharded indexes (:func:`build_fielded_sharded` +
:func:`bm25_topk_fielded_sharded`) — each field rides the full
single-field machinery (SPIMI build, delta+varint blocks, block-max
WAND), so single-field ranked queries go straight to
``bm25_topk_sharded`` on that field's index at 100 TB scale.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import simple_tokens
from .query import MAX_HITS, Clause, ParsedQuery, bm25_idf, parse_query
from .build import BM25_B, BM25_K1

COPY_GAP = 1_000_000  # position gap between copy_to sources


@dataclass
class FieldedIndex:
    postings: DataFrame  # (field, term, doc_id, tf)
    terms: DataFrame  # (field, term, df)
    doclens: DataFrame  # (doc_id, field, dl)
    stats: dict[str, tuple[int, float]]  # field -> (doc_count, avgdl)
    docstore: DataFrame
    fields: tuple[str, ...]
    uid: int = dc_field(default_factory=itertools.count().__next__)


def _field_tokens(df: DataFrame, field_name: str, src_col: str, id_col: str) -> DataFrame:
    """(doc_id, field, term, pos) for one source column (simple analyzer:
    lowercase alnum runs — the oracle-expressible tokenization)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(field_name).alias("field"),
        F.posexplode(simple_tokens(F.col(src_col))).alias("pos", "term"),
    )


def build_fielded_index(
    df: DataFrame,
    fields: dict[str, str],
    copy_to: dict[str, list[str]] | None = None,
    id_col: str = "doc_id",
) -> FieldedIndex:
    """Build per-field postings from ``fields`` (field name → source
    column) plus ``copy_to`` (source field → catch-all target fields).

    One exploded token relation carries every field; all downstream
    aggregations are single shuffles keyed by (field, term[, doc]) —
    uniform keys, partial aggregation, no skew pivot.  The copy_to
    streams are derived from the same scan (no re-read of the source).
    """
    copy_to = copy_to or {}
    streams = []
    for fname, src in fields.items():
        streams.append(_field_tokens(df, fname, src, id_col))
    # copy_to: re-emit each source field's tokens under the target field,
    # offsetting positions per source so phrases can't straddle sources
    for i, (src_field, targets) in enumerate(sorted(copy_to.items())):
        src_col = fields[src_field]
        for tgt in targets:
            t = _field_tokens(df, tgt, src_col, id_col)
            streams.append(t.withColumn("pos", F.col("pos") + F.lit(i * COPY_GAP)))
    toks = streams[0]
    for s in streams[1:]:
        toks = toks.unionByName(s)

    postings = toks.groupBy("field", "term", "doc_id").agg(
        F.count("*").cast("int").alias("tf")
    )
    terms = postings.groupBy("field", "term").agg(F.count("*").cast("long").alias("df"))
    doclens = toks.groupBy("doc_id", "field").agg(F.count("*").alias("dl"))
    # exact integer sum → one Python division: float avg() is reduction-
    # order-dependent and would break bit-identical ranks across
    # partitionings (dl is integral, so the sum is exact in int64)
    stats_rows = (
        doclens.groupBy("field")
        .agg(F.count("*").alias("doc_count"), F.sum("dl").alias("dl_sum"))
        .collect()
    )
    stats = {
        r["field"]: (int(r["doc_count"]), int(r["dl_sum"]) / int(r["doc_count"]))
        for r in stats_rows
    }
    all_fields = tuple(sorted(stats))
    return FieldedIndex(
        postings=postings,
        terms=terms,
        doclens=doclens,
        stats=stats,
        docstore=df.select(F.col(id_col).alias("doc_id")),
        fields=all_fields,
    )


# --------------------------------------------------------------------------
# query parsing with field prefixes
# --------------------------------------------------------------------------

_FIELD_PREFIX = re.compile(r"^(-?)([A-Za-z_][\w.]*):(.+)$", re.S)


def parse_fielded_query(q: str, default_field: str) -> ParsedQuery:
    """``field:term`` / ``field:"a b"`` / bare terms (→ default field),
    with the same AND/OR/NOT structure as :func:`query.parse_query`.
    Each clause carries its field in ``Clause.field_name``."""
    # tag each whitespace token with its field, then reuse the base parser
    out = ParsedQuery()
    pending_or = False
    token_re = re.compile(r"-?(?:[A-Za-z_][\w.]*:)?\"[^\"]*\"|\||\S+")
    for m in token_re.finditer(q):
        tok = m.group(0)
        if tok == "|":
            pending_or = True
            continue
        fname = default_field
        fm = _FIELD_PREFIX.match(tok)
        if fm and not tok.startswith('"'):
            tok = fm.group(1) + fm.group(3)
            fname = fm.group(2)
        sub = parse_query(tok)
        if not sub.groups:
            continue
        clause = sub.groups[0][0]
        clause.field_name = fname  # type: ignore[attr-defined]
        if pending_or and out.groups:
            out.groups[-1].append(clause)
        else:
            out.groups.append([clause])
        pending_or = False
    return out


def _clause_field(c: Clause, default_field: str) -> str:
    return getattr(c, "field_name", None) or default_field


def _clause_docs(index: FieldedIndex, c: Clause, fname: str) -> DataFrame:
    p = index.postings.filter(F.col("field") == fname)
    if c.kind == "term":
        return p.filter(F.col("term") == c.terms[0]).select("doc_id")
    if c.kind == "prefix":
        return p.filter(F.col("term").startswith(c.terms[0])).select("doc_id").distinct()
    if c.kind == "phrase":
        # positions are not materialized in the fielded postings; AND of
        # the phrase terms within the field is the documented relaxation
        out = None
        for t in c.terms:
            d = p.filter(F.col("term") == t).select("doc_id")
            out = d if out is None else out.join(d, "doc_id", "left_semi")
        return out
    raise ValueError(f"fielded path does not support clause kind {c.kind!r}")


def bm25_topk_fielded(
    index: FieldedIndex,
    query: str | ParsedQuery,
    k: int = 10,
    default_field: str = "all",
) -> DataFrame:
    """Fielded boolean + BM25 top-k (DataFrame path, fully Catalyst).

    Boolean semantics match the default path (whitespace = AND, ``|`` =
    OR, ``-`` = NOT), with each clause scoped to its field.  Scores sum
    per-clause BM25 contributions, each computed in its clause's field
    scoring space; float sums run in sorted (field, term) order so ranks
    are parallelism-invariant, same discipline as the flat engine.
    """
    pq = (
        query
        if isinstance(query, ParsedQuery)
        else parse_fielded_query(query, default_field)
    )
    k = min(k, MAX_HITS)
    spark = index.postings.sparkSession

    # boolean match set: AND of OR-groups, minus negated clauses
    cur: DataFrame | None = None
    negatives = []
    score_pairs: set[tuple[str, str]] = set()
    for group in pq.groups:
        gdocs = None
        for c in group:
            fname = _clause_field(c, default_field)
            if c.negated:
                negatives.append(_clause_docs(index, c, fname))
                continue
            if c.kind == "prefix":
                expd = [
                    r["term"]
                    for r in index.terms.filter(
                        (F.col("field") == fname)
                        & F.col("term").startswith(c.terms[0])
                    )
                    .select("term")
                    .collect()
                ]
                score_pairs.update((fname, t) for t in expd)
            else:
                score_pairs.update((fname, t) for t in c.terms)
            d = _clause_docs(index, c, fname)
            gdocs = d if gdocs is None else gdocs.union(d).distinct()
        if gdocs is not None:
            cur = gdocs if cur is None else cur.join(gdocs, "doc_id", "left_semi")
    if cur is None:
        cur = index.docstore.select("doc_id")
    for nd in negatives:
        cur = cur.join(nd, "doc_id", "left_anti")

    if not score_pairs:
        return (
            cur.withColumn("score", F.lit(0.0))
            .orderBy("doc_id")
            .limit(k)
            .select("doc_id", "score")
        )

    # per-(field, term) idf computed in Python (one runtime for ln — the
    # bit-exactness discipline of the flat engine), broadcast as a table
    pairs = sorted(score_pairs)
    pair_cond = None
    for fname, t in pairs:
        c = (F.col("field") == fname) & (F.col("term") == t)
        pair_cond = c if pair_cond is None else (pair_cond | c)
    df_rows = index.terms.filter(pair_cond).collect()
    dfs = {(r["field"], r["term"]): int(r["df"]) for r in df_rows}
    idf_rows = [
        (fname, t, bm25_idf(index.stats[fname][0], dfs.get((fname, t), 0)),
         index.stats[fname][1])
        for fname, t in pairs
        if fname in index.stats
    ]
    idf_tbl = F.broadcast(
        spark.createDataFrame(
            idf_rows, "field string, term string, idf double, avgdl double"
        )
    )

    p = index.postings.filter(pair_cond)
    tfd = F.col("tf").cast("double")
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = (
        p.join(idf_tbl, ["field", "term"])
        .join(index.doclens, ["doc_id", "field"])
        .join(cur, "doc_id", "left_semi")
        .withColumn("contrib", F.col("idf") * tfd * F.lit(BM25_K1 + 1.0) / (tfd + norm))
    )
    scored = contrib.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("field", "term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


class LocalFieldedSearcher:
    """Serving tier for fielded queries — same role as
    ``serve.LocalSearcher`` for the flat index: load the per-field
    postings + doclens + stats once (driver-side collect; a production
    replica loads its slice from the snapshot parquet) and answer
    ``field:term`` boolean/BM25 queries in pure Python/NumPy at
    interactive latency, rank-identical to :func:`bm25_topk_fielded`
    (same idf source, same sorted-(field,term) float64 summation, same
    doc_id tie-break)."""

    def __init__(self, postings_rows, doclens_rows, stats, all_docs, fields):
        import numpy as np

        self.stats = stats
        self.fields = fields
        self._plists: dict[tuple[str, str], tuple] = {}
        by_key: dict[tuple[str, str], list[tuple[int, int]]] = {}
        for r in postings_rows:
            by_key.setdefault((r["field"], r["term"]), []).append(
                (int(r["doc_id"]), int(r["tf"]))
            )
        for key, pairs in by_key.items():
            pairs.sort()
            self._plists[key] = (
                np.asarray([d for d, _ in pairs], dtype=np.int64),
                np.asarray([t for _, t in pairs], dtype=np.float64),
            )
        self._dl: dict[tuple[int, str], float] = {
            (int(r["doc_id"]), r["field"]): float(r["dl"]) for r in doclens_rows
        }
        self._all_docs = sorted(all_docs)

    @classmethod
    def from_index(cls, fidx: FieldedIndex) -> "LocalFieldedSearcher":
        return cls(
            fidx.postings.collect(),
            fidx.doclens.collect(),
            fidx.stats,
            [int(r["doc_id"]) for r in fidx.docstore.collect()],
            fidx.fields,
        )

    def _clause_docset(self, c: Clause, fname: str) -> set[int]:
        if c.kind == "term":
            pl = self._plists.get((fname, c.terms[0]))
            return set(pl[0].tolist()) if pl else set()
        if c.kind == "prefix":
            out: set[int] = set()
            for (f, t), pl in self._plists.items():
                if f == fname and t.startswith(c.terms[0]):
                    out.update(pl[0].tolist())
            return out
        if c.kind == "phrase":  # AND-within-field relaxation (as the DF path)
            cur: set[int] | None = None
            for t in c.terms:
                pl = self._plists.get((fname, t))
                s = set(pl[0].tolist()) if pl else set()
                cur = s if cur is None else (cur & s)
            return cur or set()
        raise ValueError(f"fielded serving does not support clause kind {c.kind!r}")

    def search(
        self, query: str | ParsedQuery, k: int = 10, default_field: str = "all"
    ) -> list[tuple[int, float]]:
        pq = (
            query
            if isinstance(query, ParsedQuery)
            else parse_fielded_query(query, default_field)
        )
        k = min(k, MAX_HITS)
        cur: set[int] | None = None
        negs: list[set[int]] = []
        score_pairs: set[tuple[str, str]] = set()
        for group in pq.groups:
            gdocs: set[int] | None = None
            for c in group:
                fname = _clause_field(c, default_field)
                if c.negated:
                    negs.append(self._clause_docset(c, fname))
                    continue
                if c.kind == "prefix":
                    score_pairs.update(
                        (f, t)
                        for (f, t) in self._plists
                        if f == fname and t.startswith(c.terms[0])
                    )
                else:
                    score_pairs.update((fname, t) for t in c.terms)
                d = self._clause_docset(c, fname)
                gdocs = d if gdocs is None else (gdocs | d)
            if gdocs is not None:
                cur = gdocs if cur is None else (cur & gdocs)
        if cur is None:
            cur = set(self._all_docs)
        for n in negs:
            cur -= n
        if not score_pairs:
            return [(d, 0.0) for d in sorted(cur)[:k]]
        scores: dict[int, float] = {}
        for fname, term in sorted(score_pairs):  # sorted-pair float order
            pl = self._plists.get((fname, term))
            if pl is None or fname not in self.stats:
                continue
            dc, avgdl = self.stats[fname]
            idf = bm25_idf(dc, int(pl[0].size))
            for doc, tf in zip(pl[0].tolist(), pl[1].tolist()):
                if doc not in cur:
                    continue
                dl = self._dl.get((doc, fname), 0.0)
                norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                scores[doc] = scores.get(doc, 0.0) + idf * tf * (BM25_K1 + 1.0) / (tf + norm)
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        return [(d, s) for d, s in ranked]


# --------------------------------------------------------------------------
# fielded over the compressed/sharded machinery: one BuiltIndex per field
# --------------------------------------------------------------------------


def build_fielded_sharded(
    df: DataFrame,
    fields: dict[str, str],
    copy_to: dict[str, list[str]] | None = None,
    id_col: str = "doc_id",
    shard_size: int = 1 << 17,
):
    """Per-field compressed doc-sharded indexes over a SHARED doc_id
    space → ``{field: BuiltIndex}``.

    Each field is its own scoring space (how Lucene models fields), so
    each gets the full single-field machinery — SPIMI build, delta+varint
    blocks, block-max WAND, LocalSearcher — unchanged and with all its
    invariants.  copy_to targets index the space-joined concatenation of
    their sources (dl and term stats match the union of the source
    streams; phrases can straddle a source boundary here, unlike the
    position-gapped DataFrame tier — the one documented deviation).
    Single-field ranked queries route straight to that field's
    ``bm25_topk_sharded``; cross-field queries compose through
    :func:`bm25_topk_fielded_sharded`.
    """
    from .build import build_index

    copy_to = copy_to or {}
    sources: dict[str, list[str]] = {f: [src] for f, src in fields.items()}
    for src_field, targets in sorted(copy_to.items()):
        for tgt in targets:
            sources.setdefault(tgt, []).append(fields[src_field])
    out = {}
    for fname, cols in sources.items():
        text = F.concat_ws(" ", *[F.coalesce(F.col(c), F.lit("")) for c in cols])
        docs = df.select(F.col(id_col).alias("doc_id"), text.alias("content"))
        out[fname] = build_index(
            docs, text_col="content", analyzer="simple", shard_size=shard_size
        )
    return out


def bm25_topk_fielded_sharded(
    indexes: dict,
    query: str | ParsedQuery,
    k: int = 10,
    default_field: str = "all",
) -> DataFrame:
    """Fielded boolean + BM25 top-k over per-field sharded indexes,
    rank-identical to :func:`bm25_topk_fielded` by construction (same
    per-field stats, same Python idf, same sorted-(field,term) float
    summation, same tie-break) — tested for equality.

    Boolean membership per clause comes from the clause's field index
    (term-pruned scans); scoring unions the per-field contribution
    relations and sums in sorted (field, term) order.
    """
    from .query import _clause_docs_df, _expand_prefix, _idf_table, matching_docs_df

    pq = (
        query
        if isinstance(query, ParsedQuery)
        else parse_fielded_query(query, default_field)
    )
    k = min(k, MAX_HITS)

    # boolean match set: AND of OR-groups, minus negations, per field
    cur: DataFrame | None = None
    negatives = []
    score_terms: dict[str, set[str]] = {}
    for group in pq.groups:
        gdocs = None
        for c in group:
            fname = _clause_field(c, default_field)
            idx = indexes[fname]
            if c.negated:
                negatives.append(_clause_docs_df(idx, c))
                continue
            if c.kind == "prefix":
                score_terms.setdefault(fname, set()).update(
                    _expand_prefix(idx, c.terms[0])
                )
            else:
                score_terms.setdefault(fname, set()).update(c.terms)
            d = _clause_docs_df(idx, c)
            gdocs = d if gdocs is None else gdocs.union(d).distinct()
        if gdocs is not None:
            cur = gdocs if cur is None else cur.join(gdocs, "doc_id", "left_semi")
    if cur is None:
        any_idx = next(iter(indexes.values()))
        cur = any_idx.docstore.select("doc_id")
    for nd in negatives:
        cur = cur.join(nd, "doc_id", "left_anti")

    if not score_terms:
        return (
            cur.withColumn("score", F.lit(0.0))
            .orderBy("doc_id")
            .limit(k)
            .select("doc_id", "score")
        )

    contribs = None
    for fname in sorted(score_terms):
        idx = indexes[fname]
        qterms = sorted(score_terms[fname])
        p = idx.postings.filter(F.col("term").isin(qterms))
        tfd = F.col("tf").cast("double")
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.lit(float(idx.avgdl))
        )
        c = (
            p.join(_idf_table(idx, qterms), "term")
            .join(idx.doclens, "doc_id")
            .select(
                "doc_id",
                F.lit(fname).alias("field"),
                "term",
                (F.col("idf") * tfd * F.lit(BM25_K1 + 1.0) / (tfd + norm)).alias(
                    "contrib"
                ),
            )
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    scored = (
        contribs.join(cur, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("field", "term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )
