"""Query engine: boolean / phrase / prefix planning + BM25 top-k retrieval.

Replaces the Elasticsearch query surface the reference delegates to
(``ElasticsearchClient.searchDocuments``, ``core/src/main/java/hbz/
limetrans/ElasticsearchClient.java:411``; semantics pinned by
``main/src/test/java/hbz/limetrans/ElasticsearchQueryTest.java:46-55``):
``simple_query_string`` with default operator AND, ``|`` = OR, ``-`` =
NOT, ``"..."`` = phrase, ``term*`` = prefix, top-k capped at
``MAX_HITS = 1000`` (``ElasticsearchClient.java:30``).

Two execution paths, rank-identical by construction (tested):

* **DataFrame path** (``bm25_topk_df``): joins over the flat
  ``(term, doc_id, tf)`` postings — pure Catalyst (filter pushdown on
  ``term``, broadcast of per-term stats, partial aggregation).  This is
  the oracle-checkable path and the general fallback.
* **Sharded WAND path** (``bm25_topk_sharded``): the compressed,
  doc-sharded index.  Each shard scores locally (document-at-a-time
  block-max WAND with skip pointers, or a vectorized
  term-at-a-time scorer) and emits its local top-k; only
  ``k × n_shards`` rows reach the global merge — the layout that keeps
  p50 latency flat as the corpus grows 100×.

Determinism: per-(term,doc) contributions are float64 and summed in
sorted-term order (``F.aggregate`` over a sorted array in the DataFrame
path; sorted-iteration in the shard scorer), ties broken by
``doc_id`` asc — so ranks are identical at any parallelism, as the
north rule requires.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.analysis import simple_tokenize_py
from . import codec
from .build import BM25_B, BM25_K1, BuiltIndex


@pandas_udf(T.ArrayType(T.IntegerType()))
def _pos_decode_udf(blob: pd.Series, tf: pd.Series) -> pd.Series:
    """Decode one posting's delta-varint positions → int array (used only
    on term-filtered rows of phrase queries — the cold path)."""
    out = []
    for b, t in zip(blob, tf):
        if not t or b is None:
            out.append([])
        else:
            out.append(
                np.cumsum(codec.varint_decode(bytes(b), int(t))).astype("int32").tolist()
            )
    return pd.Series(out)

MAX_HITS = 1000  # reference cap: ElasticsearchClient.java:30
MAX_PREFIX_EXPANSIONS = 128


def query_analyzer_for(index) -> "callable":
    """Query-side analyzer twin for a flat index, derived from its
    build-time analyzer label — a ``simple_stem`` index stems the query
    terms, ``simple_stop`` drops stopwords (the per-field analysis the
    fielded tier already does via ``_QUERY_ANALYZERS``).  ``code`` and
    ``simple`` both analyze queries with the simple tokenizer: single
    lowercase query terms are identical under both, and the code
    analyzer's catenate/part variants are index-side overlap tokens the
    simple split already matches ('parse-json' → [parse, json])."""
    from ..functions.analysis import (
        german_query_tokenize_py,
        stemmed_query_tokenize_py,
        stop_german_query_tokenize_py,
        stop_query_tokenize_py,
    )

    twins = {
        "simple_stem": stemmed_query_tokenize_py,
        "simple_stem_de": german_query_tokenize_py,
        "simple_stop_stem_de": stop_german_query_tokenize_py,
        "simple_stop": stop_query_tokenize_py,
    }
    label = index.metrics.get("analyzer") if getattr(index, "metrics", None) else None
    return twins.get(label, simple_tokenize_py)


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# --------------------------------------------------------------------------
# mini query language (simple_query_string subset)
# --------------------------------------------------------------------------


@dataclass
class Clause:
    kind: str  # "term" | "phrase" | "prefix" | "fuzzy"
    terms: tuple[str, ...]
    negated: bool = False
    fuzz: int = 0  # max edit distance for kind == "fuzzy"
    field_name: str | None = None  # set by the fielded parser; None = default field
    slop: int = 0  # phrase slop: total extra-gap budget for kind == "phrase"
    # ordered (default) = strictly order-preserving NEAR; False = Lucene-style
    # out-of-order slop (see parse_query(unordered_slop=True)); only
    # meaningful when slop > 0
    in_order: bool = True


@dataclass
class ParsedQuery:
    """AND of clause-groups; each group is an OR of clauses."""

    groups: list[list[Clause]] = field(default_factory=list)

    @property
    def positive_terms(self) -> list[str]:
        out: list[str] = []
        for g in self.groups:
            for c in g:
                if not c.negated:
                    out.extend(c.terms)
        return sorted(set(out))


_QTOKEN = re.compile(r"-?\"[^\"]*\"(?:~\d+)?|\||\S+")
_FUZZY = re.compile(r"^(.*)~(\d)$")
_PHRASE_TOK = re.compile(r"^\"([^\"]*)\"(?:~(\d+))?$")


def parse_query(
    q: str, analyze=simple_tokenize_py, unordered_slop: bool = False
) -> ParsedQuery:
    """simple_query_string subset: whitespace = AND, ``|`` = OR,
    ``-x`` = NOT, ``"a b"`` = phrase, ``"a b"~N`` = sloppy phrase (NEAR),
    ``t*`` = prefix, ``t~N`` = fuzzy (the reference enables
    OR|NOT|PREFIX|PHRASE|NEAR|FUZZY|…, ElasticsearchQueryTest.java:53).

    ``unordered_slop=True`` opts into Lucene-style out-of-order NEAR:
    ``"a b"~2`` also matches ``b a``.  A sloppy phrase then matches iff
    some choice of per-term occurrence positions has adjusted-position
    span ``max(pᵢ−i) − min(pᵢ−i) ≤ slop`` — identical to the default
    ordered total-extra-gap cost whenever the chosen occurrences are in
    phrase order (the span telescopes into the gap sum), and charging a
    reversal of adjacent terms 2 slop exactly as Lucene's
    SloppyPhraseScorer does.  The default (ordered-only) remains the
    engine's documented deviation, mirrored by all oracles; phrases
    with REPEATED terms reject the flag (Lucene's repeats handling is
    heuristic — see COVERAGE.md "Deliberate deviations")."""
    pq = ParsedQuery()
    pending_or = False
    for m in _QTOKEN.finditer(q):
        tok = m.group(0)
        if tok == "|":
            pending_or = True
            continue
        negated = tok.startswith("-")
        if negated:
            tok = tok[1:]
        fz = _FUZZY.match(tok)
        pm = _PHRASE_TOK.match(tok)
        if pm:
            terms = tuple(analyze(pm.group(1)))
            slop = int(pm.group(2) or 0)
            in_order = not (unordered_slop and slop > 0)
            if not in_order and len(set(terms)) < len(terms):
                raise ValueError(
                    "unordered slop does not support phrases with repeated "
                    f"terms: {terms}"
                )
            clause = Clause("phrase", terms, negated, slop=slop, in_order=in_order)
        elif tok.endswith("*"):
            stem = analyze(tok[:-1])
            clause = Clause("prefix", tuple(stem[-1:]), negated)
        elif fz and analyze(fz.group(1)):
            clause = Clause(
                "fuzzy", tuple(analyze(fz.group(1))[-1:]), negated, fuzz=int(fz.group(2))
            )
        else:
            terms = tuple(analyze(tok))
            if not terms:
                continue
            # one raw token may analyze to several terms → treat as phrase
            clause = (
                Clause("term", terms, negated)
                if len(terms) == 1
                else Clause("phrase", terms, negated)
            )
        if not clause.terms:
            continue
        if pending_or and pq.groups:
            pq.groups[-1].append(clause)
        else:
            pq.groups.append([clause])
        pending_or = False
    return pq


# --------------------------------------------------------------------------
# DataFrame path
# --------------------------------------------------------------------------


def _contrib_col(avgdl: float, idf_col="idf", tf_col="tf", dl_col="dl"):
    """BM25 contribution.  The idf comes in as a precomputed column
    (Python ``math.log``, broadcast per query term): JVM ``ln`` and libm
    ``log`` differ by 1 ulp on some inputs, and computing idf in one
    runtime keeps the DataFrame path and the shard scorers bit-identical.
    The remaining ops (+,*,/) are IEEE-exact everywhere."""
    tfd = F.col(tf_col).cast("double")
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col(dl_col).cast("double") / F.lit(float(avgdl))
    )
    return F.col(idf_col) * tfd * F.lit(BM25_K1 + 1.0) / (tfd + norm)


_IDF_CACHE: dict[tuple, list] = {}


def _idf_table(index: BuiltIndex, qterms: list[str]) -> DataFrame:
    """Broadcastable (term, idf) frame with idf computed in Python.
    Memoized per (index, terms) — the df lookup is one tiny collect but
    it's on every query's critical path."""
    key = (index.uid, index.n_docs, tuple(sorted(qterms)))
    if key not in _IDF_CACHE:
        rows = (
            index.terms.filter(F.col("term").isin(qterms)).select("term", "df").collect()
        )
        _IDF_CACHE[key] = [
            (r["term"], bm25_idf(index.n_docs, int(r["df"]))) for r in rows
        ]
        if len(_IDF_CACHE) > 10000:
            _IDF_CACHE.clear()
    spark = index.terms.sparkSession
    return F.broadcast(
        spark.createDataFrame(_IDF_CACHE[key], "term string, idf double")
    )


def _sloppy_init(pos_col):
    """Initial slop-DP state from the first phrase term's positions:
    struct(p = position, v = p − used_slack) with used_slack = 0."""
    return F.transform(pos_col, lambda x: F.struct(x.alias("p"), x.alias("v")))


def _sloppy_step(cur_col, pos_col, slop: int):
    """One phrase-term transition of the ordered-slop DP, JVM-side.

    Invariant: a state ``(p, v)`` means the phrase prefix can end at
    position ``p`` having consumed ``p − v`` of the slop budget (``v =
    p − used``).  The best next state at position ``x`` extends the
    predecessor with maximal ``v`` among states at ``p < x`` (strictly
    increasing positions, so an occurrence is never reused), giving
    ``v' = max_v + 1`` and feasibility ``x − v' ≤ slop``.  With
    ``slop = 0`` this degenerates to exact adjacency.  O(|cur|·|pos|)
    array ops per (doc, term) — all inside whole-stage codegen."""

    def nxt(x):
        best = F.array_max(
            F.transform(F.filter(cur_col, lambda s: s["p"] < x), lambda s: s["v"])
        )
        return F.struct(x.alias("p"), (best + F.lit(1)).alias("v"))

    cand = F.transform(pos_col, nxt)
    return F.filter(
        cand, lambda s: s["v"].isNotNull() & ((s["p"] - s["v"]) <= F.lit(int(slop)))
    )


def _sloppy_match_np(pos_lists: list[np.ndarray], slop: int) -> bool:
    """NumPy twin of :func:`_sloppy_step` for the shard/serving scorers:
    True iff an order-preserving occurrence selection exists with total
    extra gap ≤ ``slop`` (i.e. span ≤ k−1+slop).  Same DP, vectorized:
    ``v = p − used``; the best predecessor for each next position is a
    prefix-running-max + searchsorted over the (sorted) position arrays.

    Deliberate deviation from Lucene's SloppyPhraseScorer, documented:
    out-of-order matches (ES allows ``"a b"~2`` to match ``b a``) are
    excluded — matches are strictly order-preserving on every tier, and
    the SQL/regex oracle mirrors exactly that."""
    prev = pos_lists[0].astype(np.int64)
    v = prev.copy()
    for pos in pos_lists[1:]:
        if prev.size == 0:
            return False
        pref = np.maximum.accumulate(v)
        idx = np.searchsorted(prev, pos, side="left")  # #prev strictly < x
        ok = idx > 0
        x = pos[ok].astype(np.int64)
        nv = pref[idx[ok] - 1] + 1
        keep = (x - nv) <= slop
        prev, v = x[keep], nv[keep]
    return prev.size > 0


def _adjust_pos(offset: int):
    """Single-arg lambda factory: position → adjusted position
    ``p + offset``.  (Same arity pitfall as :func:`_window_covered` — a
    ``lambda x, i=i`` default-arg closure would bind as transform's
    two-arg (element, index) form and silently use the array index.)"""

    def shift(x):
        return x + F.lit(int(offset))

    return shift


def _window_covered(qcols, slop: int):
    """Single-arg lambda factory for the unordered-slop window test:
    given a window floor ``w``, True iff every term's adjusted-position
    array has an element in ``[w, w + slop]``.  (A factory rather than
    an inline default-arg lambda: PySpark reads lambda ARITY to decide
    the higher-order function's argument count, so ``lambda x, w=w``
    would bind as a two-arg lambda.)"""

    def covered(w):
        def in_window(x):
            return (x >= w) & (x <= w + F.lit(int(slop)))

        out = None
        for qc in qcols:
            c = F.exists(qc, in_window)
            out = c if out is None else (out & c)
        return out

    return covered


def phrase_match_df(
    postings: DataFrame, terms: tuple[str, ...], slop: int = 0,
    in_order: bool = True,
) -> DataFrame:
    """→ doc_ids where ``terms`` occur at consecutive positions
    (``slop = 0``) or within an order-preserving window of total extra
    gap ≤ ``slop`` (``"a b"~N`` NEAR semantics).  ``in_order=False``
    (only meaningful with ``slop > 0``): Lucene-style out-of-order NEAR
    — match iff some per-term occurrence choice has adjusted-position
    span ≤ slop (see :func:`parse_query`).

    Iterative position joins, entirely JVM-side: ``slop = 0`` carries
    the set of feasible end-positions forward (array_intersect);
    ordered ``slop > 0`` carries the :func:`_sloppy_step` DP states;
    unordered carries one adjusted-position array per term and decides
    with a single nested higher-order sliding-window expression.  One
    equi-join on doc_id per phrase term every way.  Requires postings
    built ``with_positions``.
    """
    assert terms, "empty phrase"
    pos_col = _pos_decode_udf(F.col("pos_blob"), F.col("tf"))
    if slop > 0 and not in_order:
        if len(set(terms)) < len(terms):
            raise ValueError(
                f"unordered slop does not support repeated phrase terms: {terms}"
            )
        k = len(terms)
        # adjusted positions qᵢ = p − i (+k so they stay non-negative)
        cur = postings.filter(F.col("term") == terms[0]).select(
            "doc_id", F.transform(pos_col, _adjust_pos(k)).alias("q0")
        )
        for i, t in enumerate(terms[1:], start=1):
            nxt = postings.filter(F.col("term") == t).select(
                "doc_id",
                F.transform(pos_col, _adjust_pos(k - i)).alias(f"q{i}"),
            )
            cur = cur.join(nxt, "doc_id")
        qcols = [F.col(f"q{i}") for i in range(k)]
        # the optimal window starts at some chosen q, so trying every
        # occurrence of every term as the window floor w is exhaustive
        allq = F.flatten(F.array(*qcols))

        return (
            cur.filter(F.exists(allq, _window_covered(qcols, slop)))
            .select("doc_id")
            .distinct()
        )
    if slop > 0:
        cur = (
            postings.filter(F.col("term") == terms[0])
            .select("doc_id", _sloppy_init(pos_col).alias("st"))
        )
        for t in terms[1:]:
            nxt = postings.filter(F.col("term") == t).select(
                "doc_id", pos_col.alias("pos")
            )
            cur = (
                cur.join(nxt, "doc_id")
                .select(
                    "doc_id",
                    _sloppy_step(F.col("st"), F.col("pos"), slop).alias("st"),
                )
                .filter(F.size("st") > 0)
            )
        return cur.select("doc_id").distinct()
    cur = (
        postings.filter(F.col("term") == terms[0])
        .select("doc_id", pos_col.alias("ends"))
    )
    for t in terms[1:]:
        nxt = postings.filter(F.col("term") == t).select(
            "doc_id", pos_col.alias("pos")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect(
                    F.transform("ends", lambda x: x + 1), F.col("pos")
                ).alias("ends"),
            )
            .filter(F.size("ends") > 0)
        )
    return cur.select("doc_id").distinct()


def _clause_docs_df(
    index: BuiltIndex, clause: Clause, expanded: list[str] | None = None
) -> DataFrame:
    """doc_id set matching one clause (ignoring negation).  ``expanded``:
    a pre-computed dictionary expansion for prefix/fuzzy clauses, so a
    caller that already expanded for scoring skips the second
    driver-side dictionary scan."""
    p = index.postings
    if clause.kind == "term":
        return p.filter(F.col("term") == clause.terms[0]).select("doc_id").distinct()
    if clause.kind == "phrase":
        return phrase_match_df(
            p, clause.terms, slop=clause.slop, in_order=clause.in_order
        )
    if clause.kind in ("prefix", "fuzzy"):
        if expanded is None:
            expanded = (
                _expand_prefix(index, clause.terms[0])
                if clause.kind == "prefix"
                else _expand_fuzzy(index, clause.terms[0], clause.fuzz)
            )
        return (
            p.filter(F.col("term").isin(expanded)).select("doc_id").distinct()
            if expanded
            else p.sparkSession.createDataFrame([], "doc_id long")
        )
    raise ValueError(clause.kind)


def _expand_prefix(index: BuiltIndex, stem: str) -> list[str]:
    rows = (
        index.terms.filter(F.col("term").startswith(stem))
        .select("term")
        .orderBy(F.col("df").desc(), "term")
        .limit(MAX_PREFIX_EXPANSIONS)
        .collect()
    )
    return sorted(r["term"] for r in rows)


def _expand_fuzzy(index: BuiltIndex, term: str, fuzz: int) -> list[str]:
    """Fuzzy expansion against the term dictionary: edit distance ≤ fuzz
    (simple_query_string FUZZY flag).  The length pre-filter uses the
    STORED ``tlen`` column when present (build-time materialized →
    pushable to the parquet scan's row-group stats) and only falls back
    to a computed length for legacy dictionaries."""
    n = len(term)
    len_col = (
        F.col("tlen") if "tlen" in index.terms.columns else F.length("term")
    )
    rows = (
        index.terms.filter(len_col.between(n - fuzz, n + fuzz))
        .filter(F.levenshtein(F.col("term"), F.lit(term)) <= fuzz)
        .select("term")
        .orderBy(F.col("df").desc(), "term")
        .limit(MAX_PREFIX_EXPANSIONS)
        .collect()
    )
    return sorted(r["term"] for r in rows)


def matching_docs_df(index: BuiltIndex, query: str | ParsedQuery) -> DataFrame:
    """Boolean matching doc set (AND of OR-groups, honoring negation)."""
    pq = (
        query
        if isinstance(query, ParsedQuery)
        else parse_query(query, analyze=query_analyzer_for(index))
    )
    spark = index.postings.sparkSession
    cur: DataFrame | None = None
    negatives: list[DataFrame] = []
    for group in pq.groups:
        pos = [c for c in group if not c.negated]
        neg = [c for c in group if c.negated]
        negatives.extend(_clause_docs_df(index, c) for c in neg)
        if not pos:
            continue
        gdocs = _clause_docs_df(index, pos[0])
        for c in pos[1:]:
            gdocs = gdocs.union(_clause_docs_df(index, c)).distinct()
        cur = gdocs if cur is None else cur.join(gdocs, "doc_id", "left_semi")
    if cur is None:  # pure-negative or empty query → match_all minus negatives
        cur = index.docstore.select("doc_id")
    for nd in negatives:
        cur = cur.join(nd, "doc_id", "left_anti")
    return cur


def _is_flat(pq: ParsedQuery) -> str | None:
    """'and'/'or' if the query is plain positive single-term clauses
    (no phrase/prefix/negation) — eligible for the single-pass plan."""
    clauses = [c for g in pq.groups for c in g]
    if not clauses or any(c.negated or c.kind != "term" for c in clauses):
        return None
    if all(len(g) == 1 for g in pq.groups):
        return "and"
    if len(pq.groups) == 1:
        return "or"
    return None


def bm25_topk_df(
    index: BuiltIndex,
    query: str | ParsedQuery,
    k: int = 10,
    deterministic: bool = True,
) -> DataFrame:
    """Boolean-filtered BM25 top-k over the flat postings (DataFrame path).

    Flat AND/OR queries take a single-pass plan: one postings scan →
    one aggregation producing (score, n_matched) together, the AND
    constraint as a post-aggregation filter — no separate match-set
    subtree, half the stages.  General queries (phrase/prefix/NOT)
    compose the boolean match set from :func:`matching_docs_df` and
    left-semi join it into the scoring aggregate.
    """
    pq = (
        query
        if isinstance(query, ParsedQuery)
        else parse_query(query, analyze=query_analyzer_for(index))
    )
    k = min(k, MAX_HITS)
    flat_op = _is_flat(pq)
    if flat_op is not None:
        qterms = pq.positive_terms
        p = index.postings.filter(F.col("term").isin(qterms))
        contrib = (
            p.join(_idf_table(index, qterms), "term")
            .join(index.doclens, "doc_id")
            .withColumn("contrib", _contrib_col(index.avgdl))
        )
        scored = contrib.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score"),
            F.count("*").alias("_nm"),
        )
        if flat_op == "and":
            scored = scored.filter(F.col("_nm") == len(qterms))
        return (
            scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
            .select("doc_id", "score")
        )
    score_terms: set[str] = set()
    for g in pq.groups:
        for c in g:
            if c.negated:
                continue
            if c.kind == "prefix":
                score_terms.update(_expand_prefix(index, c.terms[0]))
            elif c.kind == "fuzzy":
                score_terms.update(_expand_fuzzy(index, c.terms[0], c.fuzz))
            else:
                score_terms.update(c.terms)
    docs = matching_docs_df(index, pq)
    if not score_terms:  # match_all: score 0, doc_id order
        return (
            docs.withColumn("score", F.lit(0.0))
            .orderBy("doc_id")
            .limit(k)
            .select("doc_id", "score")
        )
    qterms = sorted(score_terms)
    p = index.postings.filter(F.col("term").isin(qterms))
    contrib = (
        p.join(_idf_table(index, qterms), "term")
        .join(index.doclens, "doc_id")
        .join(docs, "doc_id", "left_semi")
        .withColumn("contrib", _contrib_col(index.avgdl))
    )
    if deterministic:
        scored = contrib.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
    else:
        scored = contrib.groupBy("doc_id").agg(F.sum("contrib").alias("score"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


# --------------------------------------------------------------------------
# sharded compressed path: per-shard block-max WAND, global k-merge
# --------------------------------------------------------------------------


def _decode_shard_group(pdf: pd.DataFrame, shard_size: int):
    """Decode the compressed rows of one (shard, query-terms) group.

    ``pos_blob`` is optional: scoring-only queries drop the column
    before the cogroup (positions are the bulk of index bytes — tf per
    posting vs one doc gap + one tf — so shipping them through the
    shuffle and the Arrow boundary for non-phrase queries is the
    dominant avoidable cost at scale)."""
    out = {}
    has_pos = "pos_blob" in pdf.columns
    for _, row in pdf.iterrows():
        base = int(row["shard"]) * shard_size
        d, t = codec.decode_postings(
            row["doc_blob"], row["tf_blob"], int(row["n"]), base=base
        )
        out[row["term"]] = {
            "docs": d,
            "tfs": t,
            "block_last": np.asarray(row["block_last"], dtype=np.int64),
            "block_max_tf": np.asarray(row["block_max_tf"], dtype=np.int64),
            "pos_blob": row["pos_blob"] if has_pos else b"",
        }
    return out


def _taat_scores(plists: dict, idfs: dict, dl: np.ndarray, base: int, avgdl: float):
    """Vectorized term-at-a-time scoring → dense score array over the shard."""
    scores = np.zeros(dl.size, dtype=np.float64)
    nmatch = np.zeros(dl.size, dtype=np.int32)
    for term in sorted(plists):  # sorted order → deterministic float sums
        pl = plists[term]
        idx = pl["docs"] - base
        tf = pl["tfs"].astype(np.float64)
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl[idx] / avgdl)
        scores[idx] += idfs[term] * tf * (BM25_K1 + 1.0) / (tf + norm)
        nmatch[idx] += 1
    return scores, nmatch


def _wand_topk(plists: dict, idfs: dict, dl: np.ndarray, base: int, avgdl: float, k: int):
    """Document-at-a-time block-max WAND (OR semantics) over one shard.

    Skip logic: term upper bound = idf·(k1+1)·btf/(btf+k1·(1−b+b·dlmin/avgdl))
    per block (sound since tf/(tf+K) is increasing in tf, decreasing in dl);
    pivot selection on global term bounds; block-max check before scoring;
    galloping advance via ``np.searchsorted``.  Returns (doc_ids, scores).
    """
    terms = sorted(plists)
    if not terms:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    # K from the smallest *real* doc length in the shard: zero slots are
    # empty doc ids (non-full shards) — no posting can reference them, so
    # excluding them keeps the bound sound while much tighter.
    nz = dl[dl > 0.0]
    dlmin = float(nz.min()) if nz.size else 1.0
    Kmin = BM25_K1 * (1.0 - BM25_B + BM25_B * dlmin / avgdl)

    def w_ub(tf):
        return tf * (BM25_K1 + 1.0) / (tf + Kmin)

    docs = [plists[t]["docs"] for t in terms]
    tfs = [plists[t]["tfs"] for t in terms]
    blast = [plists[t]["block_last"] for t in terms]
    bmax = [
        idfs[t] * w_ub(plists[t]["block_max_tf"].astype(np.float64))
        for t in terms
    ]
    gmax = [float(b.max()) if b.size else 0.0 for b in bmax]
    ptr = [0] * len(terms)
    n = [d.size for d in docs]

    import heapq

    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap on score
    theta = 0.0

    def score_doc(doc: int) -> float:
        s = 0.0
        for i, t in enumerate(terms):
            p = ptr[i]
            if p < n[i] and docs[i][p] == doc:
                tf = float(tfs[i][p])
                norm = BM25_K1 * (
                    1.0 - BM25_B + BM25_B * float(dl[doc - base]) / avgdl
                )
                s += idfs[t] * tf * (BM25_K1 + 1.0) / (tf + norm)
        return s

    while True:
        live = [(docs[i][ptr[i]], i) for i in range(len(terms)) if ptr[i] < n[i]]
        if not live:
            break
        live.sort()
        acc, pivot_idx = 0.0, -1
        for j, (_, i) in enumerate(live):
            acc += gmax[i]
            if acc >= theta or len(heap) < k:
                pivot_idx = j
                break
        if pivot_idx < 0:
            break
        pivot_doc = int(live[pivot_idx][0])
        # widen over doc ties: every list whose current doc == pivot_doc
        # contributes to the pivot's score and must be inside the bound
        pend = pivot_idx
        while pend + 1 < len(live) and int(live[pend + 1][0]) == pivot_doc:
            pend += 1
        # block-max refinement at the pivot
        bub = 0.0
        for _, i in live[: pend + 1]:
            bi = int(np.searchsorted(blast[i], pivot_doc))
            if bi < bmax[i].size:
                bub += float(bmax[i][bi])
        if len(heap) >= k and bub < theta:
            # BMW skip rule: bub bounds every doc in [pivot_doc, nxt) where
            # nxt = 1 + min over *prefix* lists of the end of the block
            # containing pivot_doc, further capped by the first suffix
            # list's current doc (a doc ≥ that gains its contribution, so
            # the bound no longer applies) and floored at pivot_doc + 1.
            # Advancing any prefix list past another's block end — the old
            # behavior — silently dropped that term's contribution for docs
            # in the gap and broke rank identity on multi-block shards.
            nxt = np.iinfo(np.int64).max
            for _, i in live[: pend + 1]:
                bi = int(np.searchsorted(blast[i], pivot_doc))
                if bi < blast[i].size:
                    nxt = min(nxt, int(blast[i][bi]) + 1)
            if pend + 1 < len(live):
                nxt = min(nxt, int(live[pend + 1][0]))
            nxt = max(nxt, pivot_doc + 1)
            for _, i in live[: pend + 1]:
                if docs[i][ptr[i]] < nxt:
                    ptr[i] = int(np.searchsorted(docs[i], nxt))
            continue
        if live[0][0] == pivot_doc:
            # all pre-pivot terms aligned → full score
            for _, i in live:
                if ptr[i] < n[i] and docs[i][ptr[i]] < pivot_doc:
                    ptr[i] = int(np.searchsorted(docs[i], pivot_doc))
            s = score_doc(pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, (s, -pivot_doc))
            elif (s, -pivot_doc) > heap[0]:
                heapq.heapreplace(heap, (s, -pivot_doc))
            if len(heap) >= k:
                theta = heap[0][0]
            for _, i in live:
                if ptr[i] < n[i] and docs[i][ptr[i]] == pivot_doc:
                    ptr[i] += 1
        else:
            # advance laggards to the pivot (galloping)
            for _, i in live[:pivot_idx]:
                ptr[i] = int(np.searchsorted(docs[i], pivot_doc))
    if not heap:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    items = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return (
        np.array([-d for _, d in items], dtype=np.int64),
        np.array([s for s, _ in items]),
    )


def _phrase_docs_shard(
    plists: dict, terms: tuple[str, ...], base: int, slop: int = 0,
    in_order: bool = True,
) -> np.ndarray:
    """Positional phrase intersection inside one shard → matching doc_ids
    (``slop > 0`` → NEAR via :func:`_phrase_docs_vec`; ``in_order=False``
    → Lucene-style out-of-order window).

    Positions are decoded lazily from the phrase terms' blobs only for
    docs surviving the doc-level intersection."""
    if slop > 0 and not in_order and len(set(terms)) < len(terms):
        raise ValueError(
            f"unordered slop does not support repeated phrase terms: {terms}"
        )
    if any(t not in plists for t in terms):
        return np.zeros(0, dtype=np.int64)
    cand = plists[terms[0]]["docs"]
    for t in terms[1:]:
        cand = np.intersect1d(cand, plists[t]["docs"], assume_unique=True)
    if cand.size == 0:
        return cand
    for t in set(terms):
        pl = plists[t]
        if "pos_flat" in pl:  # CSR cache: decode once per plist,
            continue  # reuse across queries
        if len(pl["pos_blob"]) == 0 and int(pl["tfs"].sum()) > 0:
            raise ValueError("phrase query requires an index built with_positions=True")
        plist = pl.get("positions")
        if plist is None:
            plist = codec.decode_positions(pl["pos_blob"], pl["tfs"])
        # CSR layout (flat positions + per-doc offsets): phrase key
        # construction becomes a pure-NumPy gather with no per-doc
        # Python loop (the list-of-arrays shape dominated warm phrase
        # serving latency at ~3 100 tiny asarray calls per query)
        sizes = np.fromiter(
            (len(p) for p in plist), dtype=np.int64, count=len(plist)
        )
        pl["pos_starts"] = np.concatenate(
            (np.zeros(1, dtype=np.int64), np.cumsum(sizes))
        )
        pl["pos_flat"] = (
            np.concatenate([np.asarray(p, dtype=np.int64) for p in plist])
            if len(plist)
            else np.zeros(0, dtype=np.int64)
        )
        pl.pop("positions", None)  # superseded by the CSR pair
    cand64 = cand.astype(np.int64)
    per_term = []
    for t in terms:
        pl = plists[t]
        j = np.searchsorted(pl["docs"], cand)
        starts, flat = pl["pos_starts"], pl["pos_flat"]
        counts = starts[j + 1] - starts[j]
        total = int(counts.sum())
        begins = np.cumsum(counts) - counts  # exclusive prefix
        gather = (
            np.arange(total, dtype=np.int64)
            + np.repeat(starts[j] - begins, counts)
        )
        per_term.append((np.repeat(cand64, counts), flat[gather]))
    return _phrase_docs_vec(cand, per_term, slop, in_order=in_order)


def _phrase_docs_vec(
    cand: np.ndarray, per_term: list[list[np.ndarray]], slop: int,
    in_order: bool = True,
) -> np.ndarray:
    """Vectorized phrase matching over candidate docs — shared by the
    shard scorer and the fielded serving tier.

    ``cand``: sorted candidate doc ids; ``per_term[i]``: either one
    sorted position array per candidate doc for phrase term i (legacy
    list shape, fielded serving tier) or an already-flat
    ``(docs_rep, pos_cat)`` int64 pair (CSR gather in
    :func:`_phrase_docs_shard` — no per-doc Python).

    Exact (``slop = 0``): term i's occurrence (doc, p) becomes key
    doc·BIG + (p − i); a phrase occurrence is a key shared by every
    term — one intersect1d per term, no per-doc loop (the old per-doc
    shape dominated warm phrase serving latency).

    Sloppy: the prefix-max DP of :func:`_sloppy_match_np`, run ONCE over
    doc·BIG + pos keys for all docs together.  Cross-doc transitions are
    rejected automatically (a predecessor from an earlier doc leaves
    x − v' ≥ BIG ≫ slop, and a same-doc predecessor's v dominates the
    prefix max), so this is exactly the per-doc DP.

    Unordered (``in_order=False``, slop > 0): one sorted composite-key
    array doc·BIG + (p − i + k) per term; every occurrence is tried as
    the window floor w, and term i is covered iff its smallest key ≥ w
    is ≤ w + slop (one searchsorted per term over all floors at once —
    no per-doc loop, cross-doc windows impossible since BIG ≫ slop)."""
    BIG = np.int64(1) << 33  # positions are int32-bounded
    cand64 = cand.astype(np.int64)

    def _flat(i: int) -> tuple[np.ndarray, np.ndarray]:
        e = per_term[i]
        if isinstance(e, tuple):
            return e
        reps = np.fromiter((p.size for p in e), dtype=np.int64, count=len(e))
        pos_cat = (
            np.concatenate(e).astype(np.int64) if e else np.zeros(0, dtype=np.int64)
        )
        return np.repeat(cand64, reps), pos_cat

    if slop > 0 and not in_order:
        k = np.int64(len(per_term))

        def keys_unordered(i: int) -> np.ndarray:
            docs_rep, pos_cat = _flat(i)
            return docs_rep * BIG + (pos_cat - np.int64(i) + k)

        term_keys = [keys_unordered(i) for i in range(len(per_term))]
        floors = np.sort(np.concatenate(term_keys))
        covered = np.ones(floors.size, dtype=bool)
        for tk in term_keys:
            idx = np.searchsorted(tk, floors, side="left")
            ok = idx < tk.size
            cov = np.zeros(floors.size, dtype=bool)
            cov[ok] = tk[idx[ok]] <= floors[ok] + slop
            covered &= cov
        return np.unique(floors[covered] // BIG)

    def keys_for(i: int, align: bool) -> np.ndarray:
        docs_rep, pos_cat = _flat(i)
        if align:
            pos_cat = pos_cat - i
            mask = pos_cat >= 0
            docs_rep, pos_cat = docs_rep[mask], pos_cat[mask]
        return docs_rep * BIG + pos_cat

    if slop == 0:
        cur = None
        for i in range(len(per_term)):
            keys = keys_for(i, align=True)
            cur = keys if cur is None else np.intersect1d(cur, keys, assume_unique=True)
            if cur.size == 0:
                return np.zeros(0, dtype=np.int64)
        return np.unique(cur // BIG)
    prev = keys_for(0, align=False)
    v = prev.copy()
    for i in range(1, len(per_term)):
        if prev.size == 0:
            return np.zeros(0, dtype=np.int64)
        ks = keys_for(i, align=False)
        pref = np.maximum.accumulate(v)
        idx = np.searchsorted(prev, ks, side="left")
        ok = idx > 0
        x = ks[ok]
        nv = pref[idx[ok] - 1] + 1
        keep = (x - nv) <= slop
        prev, v = x[keep], nv[keep]
    return np.unique(prev // BIG)


def _clause_key(clause: Clause) -> tuple:
    """Value key for expansion lookup — survives pickling to executors
    (object identity does not)."""
    return (clause.kind, clause.terms, clause.fuzz)


def _clause_docs_shard(plists: dict, clause: Clause, expansions: dict, base: int) -> np.ndarray:
    if clause.kind == "term":
        t = clause.terms[0]
        return plists[t]["docs"] if t in plists else np.zeros(0, dtype=np.int64)
    if clause.kind == "phrase":
        return _phrase_docs_shard(
            plists, clause.terms, base, slop=clause.slop, in_order=clause.in_order
        )
    # prefix/fuzzy: pre-expanded driver-side
    sets = [plists[t]["docs"] for t in expansions.get(_clause_key(clause), []) if t in plists]
    if not sets:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.concatenate(sets))


def bm25_topk_sharded(
    index: BuiltIndex,
    query: str | ParsedQuery,
    k: int = 10,
    operator: str | None = None,
    algorithm: str = "wand",
) -> DataFrame:
    """BM25 top-k over the compressed doc-sharded index — the full
    boolean surface (AND/OR groups, NOT, positional phrase, prefix,
    fuzzy), each shard answering locally, global k-merge.

    ``operator=None`` derives boolean semantics from the parsed query —
    whitespace = AND, ``|`` = OR (the reference pins
    ``default_operator=and``, ``ElasticsearchQueryTest.java:52``) — so
    the same query string returns the same doc set on all three
    execution paths (DataFrame / sharded / serving).  An explicit
    ``"and"``/``"or"`` overrides the derivation for flat term queries.

    Plan: prune index rows to the query terms (parquet min/max on the
    term-sorted files when reading from disk) → cogroup with per-shard
    doc lengths → per-shard candidate set + scoring (block-max WAND for
    flat OR queries, vectorized TAAT otherwise) via ``applyInPandas`` →
    global ``orderBy(score desc, doc_id).limit(k)`` over ≤ k·n_shards
    rows.
    """
    pq = (
        query
        if isinstance(query, ParsedQuery)
        else parse_query(query, analyze=query_analyzer_for(index))
    )
    k = min(k, MAX_HITS)
    # driver-side expansion of prefix/fuzzy clauses against the dictionary
    expansions: dict[tuple, list[str]] = {}
    needed: set[str] = set()
    has_structure = False
    for g in pq.groups:
        for c in g:
            if c.kind == "prefix":
                expansions[_clause_key(c)] = _expand_prefix(index, c.terms[0])
            elif c.kind == "fuzzy":
                expansions[_clause_key(c)] = _expand_fuzzy(index, c.terms[0], c.fuzz)
            needed.update(expansions.get(_clause_key(c), c.terms))
            if c.negated or c.kind != "term":
                has_structure = True
    score_terms = sorted(
        {
            t
            for g in pq.groups
            for c in g
            if not c.negated
            for t in expansions.get(_clause_key(c), c.terms)
        }
    )
    if not score_terms:
        if any(not c.negated for g in pq.groups for c in g):
            # positive clauses exist but every one expanded to zero
            # dictionary terms (e.g. a prefix with no vocab match):
            # nothing can match — same empty result the DF tier returns,
            # NOT an error (the guard below is for match_all shapes)
            return index.postings.sparkSession.createDataFrame(
                [], "doc_id long, score double"
            )
        raise ValueError("sharded path requires at least one positive clause")
    qterms = sorted(needed)
    n_docs, avgdl, shard_size = index.n_docs, index.avgdl, index.shard_size
    tstats = {
        r["term"]: int(r["df"])
        for r in index.terms.filter(F.col("term").isin(qterms)).collect()
    }
    idfs = {t: bm25_idf(n_docs, tstats.get(t, 0)) for t in score_terms}
    groups = pq.groups
    # flat = positive single-term clauses in a shape one operator can
    # express ('a b' → and, 'a | b' → or); mixed shapes ('a b | c') go
    # through the structured group-mask path even without NOT/phrase.
    derived = _is_flat(pq)
    if operator is None:
        operator = derived or "and"
    flat = not has_structure and derived is not None
    n_flat_terms = len(score_terms)

    rows = index.shards.filter(F.col("term").isin(qterms))
    # scoring-only queries: prune the positions column BEFORE the
    # cogroup — positions are the bulk of posting bytes (one varint per
    # token vs one gap+tf per posting), and a non-phrase query never
    # reads them, so shipping them through the shuffle and the Arrow
    # boundary is the dominant avoidable per-query cost at scale
    if "pos_blob" in rows.columns and not any(
        c.kind == "phrase" for g in pq.groups for c in g
    ):
        rows = rows.drop("pos_blob")
    # per-shard dl blobs: ONE small row per shard joins the cogroup —
    # never a per-query shuffle of the corpus-sized doclens table
    dls = index.shard_doclens()

    def score_shard(key, pdfs: pd.DataFrame, dlpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )
        if pdfs.empty or dlpdf.empty:
            return empty
        shard = int(key[0])
        base = shard * shard_size
        dl = np.zeros(shard_size, dtype=np.float64)
        row0 = dlpdf.iloc[0]
        ids = codec.delta_decode(
            codec.varint_decode(bytes(row0["doc_blob"]), int(row0["n"])), base
        ) - base
        dl[ids] = codec.varint_decode(bytes(row0["dl_blob"]), int(row0["n"]))
        plists = _decode_shard_group(pdfs, shard_size)
        score_lists = {t: plists[t] for t in score_terms if t in plists}
        if flat and operator == "or" and algorithm == "wand":
            d, s = _wand_topk(score_lists, idfs, dl, base, avgdl, k)
            return pd.DataFrame({"doc_id": d, "score": s})
        scores, nmatch = _taat_scores(score_lists, idfs, dl, base, avgdl)
        if flat:
            cand = np.nonzero(
                nmatch == n_flat_terms if operator == "and" else nmatch > 0
            )[0]
        else:
            # structured query: AND of OR-groups, minus negated clauses
            mask = np.ones(shard_size, dtype=bool)
            mask[dl == 0] = False
            for g in groups:
                pos = [c for c in g if not c.negated]
                if not pos:
                    continue
                gmask = np.zeros(shard_size, dtype=bool)
                for c in pos:
                    d = _clause_docs_shard(plists, c, expansions, base)
                    gmask[d - base] = True
                mask &= gmask
            for g in groups:
                for c in g:
                    if c.negated:
                        d = _clause_docs_shard(plists, c, expansions, base)
                        mask[d - base] = False
            cand = np.nonzero(mask)[0]
        s = scores[cand]
        if cand.size > k:
            part = np.argpartition(-s, k - 1)[:k]
            order = part[np.lexsort((cand[part], -s[part]))]
        else:
            order = np.lexsort((cand, -s))
        return pd.DataFrame(
            {"doc_id": (cand[order] + base).astype(np.int64), "score": s[order]}
        )

    local = rows.groupBy("shard").cogroup(dls.groupBy("shard")).applyInPandas(
        score_shard, "doc_id long, score double"
    )
    return local.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
