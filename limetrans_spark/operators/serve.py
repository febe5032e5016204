"""Serving-tier searcher: query the compressed index without Spark jobs.

Spark builds and publishes the index; query *serving* at interactive
latency belongs to a serving tier that memory-maps the published
artifacts.  ``LocalSearcher`` is that tier for one node: it loads the
compressed shard rows + per-shard doclen blobs + the term dictionary
(driver-side collect at open; a production replica loads only its shard
slice from the snapshot parquet) and answers BM25 / boolean / phrase /
prefix / fuzzy queries in pure NumPy — microseconds-to-milliseconds
instead of Spark-job round trips, with results bit-identical to the
DataFrame and sharded paths (same idf source, same sorted-term float64
summation, same tie-break).

This mirrors how the reference serves queries (Elasticsearch answers
from its own in-memory/seg-file structures, not from the ingest
pipeline: ``ElasticsearchClientV8.java:242-246``).
"""

from __future__ import annotations

import heapq
import re

import numpy as np

from . import codec
from .build import BM25_B, BM25_K1, BuiltIndex
from .query import (
    MAX_HITS,
    Clause,
    ParsedQuery,
    _phrase_docs_shard,
    _taat_scores,
    _wand_topk,
    bm25_idf,
    parse_query,
)

MAX_EXPANSIONS = 128


def _in_sorted(hay: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Boolean mask over ``needles``: which are present in the
    sorted-unique array ``hay``."""
    j = np.searchsorted(hay, needles)
    ok = j < hay.size
    ok[ok] = hay[j[ok]] == needles[ok]
    return ok


def _topk_vec(docs: np.ndarray, score: np.ndarray, k: int) -> list[tuple[int, float]]:
    """Exact top-k under (score desc, doc_id asc) without sorting the
    full candidate set: argpartition finds the k-th score threshold in
    O(n), then only the ≥-threshold candidates (k plus boundary ties)
    are lexsorted.  Bit-identical to a full lexsort."""
    if docs.size > max(4 * k, 1024):
        thresh = float(score[np.argpartition(-score, k - 1)[:k]].min())
        keep = np.nonzero(score >= thresh)[0]
        docs, score = docs[keep], score[keep]
    order = np.lexsort((docs, -score))[:k]
    return [(int(docs[i]), float(score[i])) for i in order]


def merge_topk(
    partials: "list[list[tuple[int, float]]]", k: int
) -> list[tuple[int, float]]:
    """Merge per-replica top-k lists into the global top-k.

    Exact because replicas score with GLOBAL statistics (df/avgdl ride
    in the terms artifact regardless of ``shard_subset`` — see
    :meth:`LocalSearcher.from_snapshot`): every replica's scores are
    the full searcher's scores on its doc slice, so the global answer
    is a pure (score desc, doc_id asc) merge of the partials.  Each
    replica must be asked for ≥ k hits; slices are disjoint, so no
    dedup is needed."""
    flat = [p for part in partials for p in part]
    if not flat:
        return []
    docs = np.fromiter((d for d, _ in flat), dtype=np.int64, count=len(flat))
    score = np.fromiter((s for _, s in flat), dtype=np.float64, count=len(flat))
    return _topk_vec(docs, score, k)


class LocalSearcher:
    """In-memory searcher over a built/published index."""

    def __init__(
        self,
        shard_rows: list,
        shard_dl_rows: list,
        term_df: dict[str, int],
        n_docs: int,
        avgdl: float,
        shard_size: int,
        analyzer: str | None = None,
        cache_budget_bytes: int = 1 << 30,
        exclude_docs: "np.ndarray | None" = None,
    ):
        # tombstones (segmented serving): these doc ids never appear in
        # results — a delta segment supersedes them
        self._exclude = (
            np.unique(np.asarray(exclude_docs, dtype=np.int64))
            if exclude_docs is not None and len(exclude_docs)
            else None
        )
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.shard_size = shard_size
        self.analyzer = analyzer
        self.term_df = term_df
        self._vocab = sorted(term_df)
        self._vocab_by_len: dict[int, list[str]] | None = None  # lazy, fuzzy only
        # raw compressed rows per (shard, term); decoded lazily + cached
        self._raw: dict[tuple[int, str], dict] = {}
        self._shards: set[int] = set()
        for r in shard_rows:
            key = (int(r["shard"]), r["term"])
            self._raw[key] = r
            self._shards.add(key[0])
        self._decoded: dict[tuple[int, str], dict] = {}
        # columnar snapshot backend (set by from_snapshot): rows are
        # fetched lazily by index so posting blobs never materialize as
        # Python objects until a query touches their term
        self._table = None
        self._snap_dir: str | None = None
        self._snap_v = 0
        self._snap_code: dict[str, int] = {}
        self._snap_keys: np.ndarray | None = None
        self._snap_rows: np.ndarray | None = None  # None = keys row-ordered
        # global (cross-shard) posting cache for the vectorized AND path
        self._gcache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._dlg: np.ndarray | None = None
        # decoded/global caches are byte-accounted against a shared
        # budget with FIFO eviction — a replica's steady-state memory
        # must stay bounded no matter the query mix (everything evicted
        # is recomputable from the Arrow table / raw rows)
        self.cache_budget_bytes = cache_budget_bytes
        self._cache_bytes = 0
        self._cache_sizes: dict[tuple, int] = {}
        self._dl: dict[int, np.ndarray] = {}
        for r in shard_dl_rows:
            sh = int(r["shard"])
            base = sh * shard_size
            ids = codec.delta_decode(
                codec.varint_decode(bytes(r["doc_blob"]), int(r["n"])), base
            ) - base
            dl = np.zeros(shard_size, dtype=np.float64)
            dl[ids] = codec.varint_decode(bytes(r["dl_blob"]), int(r["n"]))
            self._dl[sh] = dl

    @classmethod
    def from_index(cls, idx: BuiltIndex) -> "LocalSearcher":
        term_df = {r["term"]: int(r["df"]) for r in idx.terms.select("term", "df").collect()}
        return cls(
            idx.shards.collect(),
            idx.shard_doclens().collect(),
            term_df,
            idx.n_docs,
            idx.avgdl,
            idx.shard_size,
            analyzer=idx.metrics.get("analyzer"),
        )

    def override_stats(
        self, term_df: dict[str, int], n_docs: int, avgdl: float
    ) -> None:
        """Replace the GLOBAL statistics (term df, N, avgdl) this
        searcher scores with — segmented serving opens a base snapshot
        and a delta segment and both must score with the MERGED corpus
        statistics so their top-ks fold exactly.  Must be called before
        the first query: cached weight arrays bake idf/avgdl in."""
        if self._gcache or self._decoded:
            raise RuntimeError("override_stats must precede the first query")
        self.term_df = term_df
        self.n_docs = n_docs
        self.avgdl = avgdl
        self._vocab = sorted(term_df)
        self._vocab_by_len = None

    def get_document(self, doc_id: int) -> "dict | None":
        """Spark-free point lookup against the snapshot's docstore
        parquet — the serving-tier analogue of
        ``BuiltIndex.get_document`` (ElasticsearchClient getDocument):
        the doc_id equality predicate prunes the scan through parquet
        row-group min/max statistics, so a replica answers without a
        SparkSession or a full docstore load.  Tombstoned (superseded)
        docs return ``None``.  Only snapshot-backed searchers
        (:meth:`from_snapshot`) carry a docstore."""
        import os as _os

        import pyarrow.parquet as _pq

        if self._snap_dir is None:
            raise ValueError(
                "get_document needs a from_snapshot-backed searcher"
            )
        d = int(doc_id)
        if self._exclude is not None:
            i = int(np.searchsorted(self._exclude, d))
            if i < self._exclude.size and self._exclude[i] == d:
                return None
        t = _pq.read_table(
            _os.path.join(self._snap_dir, "docstore"),
            filters=[("doc_id", "==", d)],
        )
        if t.num_rows == 0:
            return None
        return {c: t.column(c)[0].as_py() for c in t.column_names}

    def _drop_excluded(self, docs: np.ndarray, *arrs: np.ndarray):
        if self._exclude is None or docs.size == 0:
            return (docs, *arrs)
        keep = ~_in_sorted(self._exclude, docs)
        return (docs[keep], *(a[keep] for a in arrs))

    @classmethod
    def from_snapshot(
        cls,
        snap: str,
        shard_subset: "list[int] | None" = None,
        cache_budget_bytes: int = 1 << 30,
        exclude_docs: "np.ndarray | None" = None,
    ) -> "LocalSearcher":
        """Open a PUBLISHED snapshot directly from its parquet artifacts
        — NO SparkSession, pure pyarrow.  This is the production-replica
        path the class docstring promises: a serving node opens the
        snapshot the build published (``plans/lifecycle.save_index``)
        and answers queries without touching the build cluster.

        ``shard_subset`` loads only those shards' posting rows and
        doclen blobs (a replica serving its slice of the doc space);
        the term dictionary — tiny, global — always loads fully, so
        idf/df statistics (and therefore scores) stay GLOBAL and the
        per-replica top-k merges correctly across replicas."""
        import json as _json
        import os as _os

        import pyarrow.parquet as _pq

        with open(_os.path.join(snap, "manifest.json")) as f:
            m = _json.load(f)
        # shard_subset pushes down into the parquet scan: with the
        # shards artifact written range-partitioned by (shard, term)
        # (save_index), file/row-group statistics prune non-slice files
        # so a 1/K replica reads ~1/K of the bytes instead of scanning
        # everything and filtering in memory
        filt = None
        if shard_subset is not None:
            keep = list(set(shard_subset))
            filt = [("shard", "in", keep)]
        table = _pq.read_table(
            _os.path.join(snap, "shards"), filters=filt
        ).combine_chunks()
        sdl_t = _pq.read_table(_os.path.join(snap, "shard_dl"), filters=filt)
        sdl = sdl_t.to_pylist()  # one small row per shard
        terms_t = _pq.read_table(
            _os.path.join(snap, "terms"), columns=["term", "df"]
        )
        term_df = dict(
            zip(
                terms_t.column("term").to_pylist(),
                terms_t.column("df").to_pylist(),
            )
        )
        self = cls(
            [],
            sdl,
            term_df,
            m["n_docs"],
            m["avgdl"],
            m["shard_size"],
            analyzer=m.get("metrics", {}).get("analyzer"),
            cache_budget_bytes=cache_budget_bytes,
            exclude_docs=exclude_docs,
        )
        # columnar backend: blobs stay in Arrow buffers until first use.
        # The key index is NUMERIC, not a Python dict — at 1M docs the
        # shards table holds ~1.9M (shard, term) rows, and materializing
        # 1.9M term strings + a 1.9M-entry dict cost 3.5 s of the 8 s
        # load.  Instead: dictionary-encode the term column (C++ hash
        # pass), remap codes to global-sorted ranks, and binary-search a
        # sorted composite shard*V+rank key.  When the artifact is
        # written sorted by (shard, term) the keys arrive monotonic and
        # the argsort is skipped entirely; any other layout falls back
        # to one int64 argsort — correctness never depends on layout.
        self._table = table
        self._snap_dir = snap
        shards_np = table.column("shard").to_numpy()
        if table.num_rows:
            enc = table.column("term").dictionary_encode().combine_chunks()
            local_vocab = enc.dictionary.to_pylist()
            rank = np.empty(len(local_vocab), dtype=np.int64)
            rank[sorted(range(len(local_vocab)), key=local_vocab.__getitem__)] = (
                np.arange(len(local_vocab))
            )
            self._snap_v = len(local_vocab)
            self._snap_code = {
                t: int(rank[i]) for i, t in enumerate(local_vocab)
            }
            keys = shards_np.astype(np.int64) * self._snap_v + rank[
                enc.indices.to_numpy()
            ]
            if keys.size > 1 and bool(np.all(np.diff(keys) > 0)):
                self._snap_keys, self._snap_rows = keys, None
            else:
                o = np.argsort(keys, kind="stable")
                self._snap_keys, self._snap_rows = keys[o], o
        self._shards.update(int(s) for s in set(shards_np.tolist()))
        return self

    # -- plumbing -----------------------------------------------------------

    def _cache_add(self, key: tuple, nbytes: int) -> None:
        """Account a cache entry; evict oldest entries (FIFO) until the
        shared budget holds.  The newest entry is never evicted, so a
        single oversized posting list still works — the budget bounds
        steady state, not one entry.  Known approximation: the phrase
        path's CSR position arrays attach to the decoded dict after
        accounting (they die with the entry on eviction but their bytes
        are not counted) — size the budget with ~2× headroom for
        phrase-heavy workloads."""
        self._cache_sizes[key] = nbytes
        self._cache_bytes += nbytes
        while self._cache_bytes > self.cache_budget_bytes:
            old = next(iter(self._cache_sizes))  # oldest (insertion order)
            if old == key:
                break
            self._cache_bytes -= self._cache_sizes.pop(old)
            if old[0] == "d":
                self._decoded.pop((old[1], old[2]), None)
            else:
                self._gcache.pop(old[1], None)

    def _plist(self, shard: int, term: str) -> dict | None:
        key = (shard, term)
        if key in self._decoded:
            return self._decoded[key]
        r = self._raw.get(key)
        if r is None and self._table is not None and self._snap_keys is not None:
            i = None
            c = self._snap_code.get(term)
            if c is not None:
                kk = shard * self._snap_v + c
                j = int(np.searchsorted(self._snap_keys, kk))
                if j < self._snap_keys.size and int(self._snap_keys[j]) == kk:
                    i = j if self._snap_rows is None else int(self._snap_rows[j])
            if i is not None:
                cols = self._table
                r = {
                    name: cols.column(name)[i].as_py()
                    for name in (
                        "doc_blob", "tf_blob", "n",
                        "block_last", "block_max_tf", "pos_blob",
                    )
                }
        if r is None:
            return None
        base = shard * self.shard_size
        d, t = codec.decode_postings(
            bytes(r["doc_blob"]), bytes(r["tf_blob"]), int(r["n"]), base=base
        )
        out = {
            "docs": d,
            "tfs": t,
            "block_last": np.asarray(r["block_last"], dtype=np.int64),
            "block_max_tf": np.asarray(r["block_max_tf"], dtype=np.int64),
            "pos_blob": bytes(r["pos_blob"]),
        }
        self._decoded[key] = out
        self._cache_add(
            ("d", shard, term),
            d.nbytes + t.nbytes + out["block_last"].nbytes
            + out["block_max_tf"].nbytes + len(out["pos_blob"]),
        )
        return out

    def _term_global(self, term: str, idf: float) -> tuple[np.ndarray, np.ndarray]:
        """Concatenated (docs, w) for one term across all loaded shards
        — docs globally sorted because shard bases ascend and postings
        are doc-sorted within a shard; w is the term's full BM25
        contribution per posting (static given the index, so queries
        only gather/scatter it).  Cached per term."""
        e = self._gcache.get(term)
        if e is None:
            ds, ts = [], []
            for shard in sorted(self._shards):
                p = self._plist(shard, term)
                if p is not None and p["docs"].size:
                    ds.append(p["docs"])
                    ts.append(p["tfs"])
            if ds:
                docs = np.concatenate(ds)
                tf = np.concatenate(ts).astype(np.float64)
                norm = BM25_K1 * (
                    1.0 - BM25_B + BM25_B * self._dl_global()[docs] / self.avgdl
                )
                e = (docs, idf * tf * (BM25_K1 + 1.0) / (tf + norm))
            else:
                e = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
            self._gcache[term] = e
            self._cache_add(("g", term), e[0].nbytes + e[1].nbytes)
        return e

    def _dl_global(self) -> np.ndarray:
        """Doc-length vector indexed by ABSOLUTE doc id (zeros outside
        the loaded shard slice — no posting can reference those)."""
        if self._dlg is None:
            size = (max(self._shards) + 1) * self.shard_size if self._shards else 0
            dlg = np.zeros(size, dtype=np.float64)
            for sh, dl in self._dl.items():
                dlg[sh * self.shard_size:(sh + 1) * self.shard_size] = dl
            self._dlg = dlg
        return self._dlg

    def _expand(self, clause: Clause) -> list[str]:
        """Prefix: bisect the sorted vocab → O(log V + matches), not a
        linear scan.  Fuzzy: scan only the length buckets within the
        edit-distance band (built lazily on first fuzzy query)."""
        import bisect

        if clause.kind == "prefix":
            stem = clause.terms[0]
            lo = bisect.bisect_left(self._vocab, stem)
            hi = bisect.bisect_left(self._vocab, stem + "￿")
            hits = self._vocab[lo:hi]
        else:
            stem, fz = clause.terms[0], clause.fuzz
            if self._vocab_by_len is None:
                by_len: dict[int, list[str]] = {}
                for t in self._vocab:
                    by_len.setdefault(len(t), []).append(t)
                self._vocab_by_len = by_len
            hits = [
                t
                for ln in range(max(1, len(stem) - fz), len(stem) + fz + 1)
                for t in self._vocab_by_len.get(ln, ())
                if _edit_le(stem, t, fz)
            ]
        hits.sort(key=lambda t: (-self.term_df[t], t))
        return sorted(hits[:MAX_EXPANSIONS])

    # -- search ---------------------------------------------------------------

    def search(
        self, query: str | ParsedQuery, k: int = 10, operator: str | None = None,
        unordered_slop: bool = False,
    ) -> list[tuple[int, float]]:
        """``operator=None`` derives semantics from the parsed query
        (whitespace = AND, ``|`` = OR — same derivation as
        ``bm25_topk_sharded``, so all paths agree on defaults); string
        queries analyze with the index analyzer's query twin (stemmed /
        stop indexes keep matching through the serving tier).
        ``unordered_slop`` opts string-query NEAR clauses into
        Lucene-style out-of-order matching (:func:`query.parse_query`)."""
        from .query import _clause_docs_shard, _clause_key, _is_flat

        if isinstance(query, ParsedQuery):
            pq = query
        else:
            from ..functions.analysis import (
                german_query_tokenize_py,
                simple_tokenize_py,
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
            pq = parse_query(
                query,
                analyze=twins.get(self.analyzer, simple_tokenize_py),
                unordered_slop=unordered_slop,
            )
        k = min(k, MAX_HITS)
        expansions: dict[tuple, list[str]] = {}
        has_structure = False
        for g in pq.groups:
            for c in g:
                if c.kind in ("prefix", "fuzzy"):
                    expansions[_clause_key(c)] = self._expand(c)
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
                # positive clauses exist but all expanded to zero vocab
                # terms (prefix/fuzzy miss) → empty result, matching the
                # DF tier; the raise is only for match_all shapes
                return []
            raise ValueError("serving path requires a positive clause")
        idfs = {t: bm25_idf(self.n_docs, self.term_df.get(t, 0)) for t in score_terms}
        derived = _is_flat(pq)
        if operator is None:
            operator = derived or "and"
        flat = not has_structure and derived is not None
        if flat and operator == "and":
            # global vectorized conjunction: the per-shard TAAT loop
            # costs thousands of small-array numpy calls (130 ms for a
            # two-common-term AND at 1M docs / 123 shards).  Two regimes,
            # both scoring with the SAME sorted-term float64 summation
            # order and (score desc, doc_id asc) tie-break as the TAAT
            # path, so results stay bit-identical:
            #  * sparse (a rare term bounds the intersection): intersect
            #    the cross-shard doc lists smallest-first via
            #    searchsorted, score only the intersection;
            #  * dense (every term is high-df, the intersection is a
            #    large fraction of the corpus): ONE global scatter-add
            #    TAAT pass over the whole doc space — identical work to
            #    the per-shard loop minus the 123× small-array overhead.
            lists = [self._term_global(t, idfs[t]) for t in score_terms]
            if any(d.size == 0 for d, _ in lists):
                return []
            dlg = self._dl_global()
            if len(lists) == 1:
                docs, w = self._drop_excluded(*lists[0])
                return _topk_vec(docs, w, k) if docs.size else []
            min_df = min(d.size for d, _ in lists)
            if min_df > dlg.size // 16:
                scores = np.zeros(dlg.size, dtype=np.float64)
                nmatch = np.zeros(dlg.size, dtype=np.int16)
                for d2, w in lists:
                    scores[d2] += w
                    nmatch[d2] += 1
                docs = np.nonzero(nmatch == np.int16(len(score_terms)))[0]
                (docs,) = self._drop_excluded(docs)
                if docs.size == 0:
                    return []
                score = scores[docs]
            else:
                docs = None
                for d2, _ in sorted(lists, key=lambda x: x[0].size):
                    if docs is None:
                        docs = d2
                        continue
                    j = np.searchsorted(d2, docs)
                    ok = j < d2.size
                    ok[ok] = d2[j[ok]] == docs[ok]
                    docs = docs[ok]
                    if docs.size == 0:
                        return []
                (docs,) = self._drop_excluded(docs)
                if docs.size == 0:
                    return []
                score = np.zeros(docs.size, dtype=np.float64)
                for d2, w in lists:
                    score += w[np.searchsorted(d2, docs)]
            return _topk_vec(docs, score, k)
        if flat and operator == "or" and self._exclude is None:
            heap: list[tuple[float, int]] = []
            for shard in sorted(self._shards):
                dl = self._dl.get(shard)
                if dl is None:
                    continue
                base = shard * self.shard_size
                plists = {
                    t: p
                    for t in score_terms
                    if (p := self._plist(shard, t)) is not None
                }
                if not plists:
                    continue
                if sum(p["docs"].size for p in plists.values()) > 50_000:
                    # WAND's skip logic pays off on long lists; short
                    # lists are faster fully vectorized (TAAT) — both exact
                    d, s = _wand_topk(plists, idfs, dl, base, self.avgdl, k)
                else:
                    scores, nmatch = _taat_scores(plists, idfs, dl, base, self.avgdl)
                    cand = np.nonzero(nmatch > 0)[0]
                    d = cand + base
                    s = scores[cand]
                if len(d) > k:
                    # per-shard vectorized top-k under the SAME ordering
                    # the global heap uses (score desc, doc_id asc)
                    order = np.lexsort((d, -np.asarray(s)))[:k]
                    d, s = np.asarray(d)[order], np.asarray(s)[order]
                for doc, sc in zip(d, s):
                    item = (float(sc), -int(doc))
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
            return [
                (-nd, sc)
                for sc, nd in sorted(heap, key=lambda x: (-x[0], -x[1]))
            ]
        # structured queries (negation / phrase / prefix / fuzzy / mixed
        # groups): global sorted-array set algebra — per group the union
        # of its positive clauses' cross-shard doc arrays, intersected
        # across groups, minus negated clauses; scoring gathers the
        # cached static per-term weights in sorted-term order (the same
        # float64 summation order as the per-shard TAAT this replaces —
        # the per-shard mask loop cost ~1 ms × n_shards per query at 1M
        # docs).  Positional clauses keep the per-shard machinery for
        # their doc sets only.
        empty = np.empty(0, dtype=np.int64)

        def clause_arr(c: Clause) -> np.ndarray:
            terms = expansions.get(_clause_key(c), c.terms)
            if c.kind in ("term", "prefix", "fuzzy"):
                parts = [
                    d
                    for t in terms
                    if (
                        d := self._term_global(
                            t, bm25_idf(self.n_docs, self.term_df.get(t, 0))
                        )[0]
                    ).size
                ]
                if not parts:
                    return empty
                if len(parts) == 1:
                    return parts[0]
                return np.unique(np.concatenate(parts))
            out = []
            for shard in sorted(self._shards):
                pl = {
                    t: p
                    for t in terms
                    if (p := self._plist(shard, t)) is not None
                }
                if len(pl) < len(set(terms)):
                    continue  # phrase needs every term in the shard
                dd = np.asarray(
                    _clause_docs_shard(pl, c, expansions, shard * self.shard_size),
                    dtype=np.int64,
                )
                if dd.size:
                    out.append(dd)
            return np.unique(np.concatenate(out)) if out else empty

        groups_arrs: list[list[np.ndarray]] = []
        negs: list[np.ndarray] = []
        for g in pq.groups:
            pos = []
            for c in g:
                (negs.append if c.negated else pos.append)(clause_arr(c))
            if pos:
                groups_arrs.append(pos)
        if not groups_arrs:  # guarded above: score_terms ⇒ a positive clause
            return []
        nd = self._dl_global().size
        total = sum(a.size for pos in groups_arrs for a in pos) + sum(
            n.size for n in negs
        )
        if total > nd // 4:
            # dense regime (every clause high-df): scatter per-group
            # presence into a count vector — O(total postings + n_docs)
            # instead of searchsorted chains over ~corpus-sized arrays
            cnt = np.zeros(nd, dtype=np.int16)
            for pos in groups_arrs:
                if len(pos) == 1:
                    cnt[pos[0]] += 1  # clause arrays are unique
                else:
                    gm = np.zeros(nd, dtype=bool)
                    for a in pos:
                        gm[a] = True
                    cnt[gm] += 1
            keep = cnt == np.int16(len(groups_arrs))
            for n in negs:
                keep[n] = False
            if self._exclude is not None:
                keep[self._exclude[self._exclude < nd]] = False
            cur = np.nonzero(keep)[0]
        else:
            cur: np.ndarray | None = None
            for pos in groups_arrs:
                gdocs = pos[0]
                for d in pos[1:]:
                    gdocs = np.union1d(gdocs, d)
                if cur is None:
                    cur = gdocs
                else:
                    j = np.searchsorted(gdocs, cur)
                    ok = j < gdocs.size
                    ok[ok] = gdocs[j[ok]] == cur[ok]
                    cur = cur[ok]
                if cur.size == 0:
                    return []
            for n in negs:
                if n.size and cur.size:
                    j = np.searchsorted(n, cur)
                    ok = j < n.size
                    ok[ok] = n[j[ok]] == cur[ok]
                    cur = cur[~ok]
            (cur,) = self._drop_excluded(cur)
        if cur.size == 0:
            return []
        if cur.size > nd // 16:
            # dense scoring: one scatter-add per term over the doc
            # space, gather at the candidates — same per-doc sorted-term
            # float64 addition order as the sparse gather
            sg = np.zeros(nd, dtype=np.float64)
            for t in score_terms:
                docs, w = self._term_global(t, idfs[t])
                if docs.size:
                    sg[docs] += w
            score = sg[cur]
        else:
            score = np.zeros(cur.size, dtype=np.float64)
            for t in score_terms:  # sorted — the shared float order
                docs, w = self._term_global(t, idfs[t])
                if docs.size == 0:
                    continue
                j = np.searchsorted(docs, cur)
                ok = j < docs.size
                ok[ok] = docs[j[ok]] == cur[ok]
                if ok.any():
                    score[ok] += w[j[ok]]
        return _topk_vec(cur, score, k)


class SegmentedSearcher:
    """Serve a base snapshot plus one or more delta segments
    (Lucene-segment style): each older segment tombstones the doc ids
    superseded by newer segments, the newest segments hold the
    updated/new documents, and ALL score with the
    exactly-merged global statistics (``lifecycle.publish_delta_segment``
    writes them into the delta snapshot), and per-query top-ks fold
    with :func:`merge_topk` — results bit-identical to a full rebuild
    over the final corpus state (pytest
    ``test_segmented_serving_equals_rebuild``).  This is the update
    path whose serving cost is independent of update frequency: absorb
    updates as segments, fold with ``compact_deltas``/a rebuild on a
    slow cadence — exactly the Elasticsearch update/rebuild split
    (``ElasticsearchIndexer.java:88-164``)."""

    def __init__(self, *searchers: LocalSearcher):
        if len(searchers) < 2:
            raise ValueError("a segment stack needs >= 2 searchers")
        self.searchers = list(searchers)  # oldest .. newest
        self.base = searchers[0]
        self.delta = searchers[-1]
        self.analyzer = self.delta.analyzer

    @classmethod
    def from_snapshots(
        cls,
        base_snap: str,
        delta_snap: str,
        cache_budget_bytes: int = 1 << 30,
    ) -> "SegmentedSearcher":
        import json as _json
        import os as _os

        import pyarrow.parquet as _pq

        with open(_os.path.join(delta_snap, "manifest.json")) as f:
            m = _json.load(f)["metrics"]
        mt = _pq.read_table(
            _os.path.join(delta_snap, "merged_terms"), columns=["term", "df"]
        )
        term_df = dict(
            zip(mt.column("term").to_pylist(), mt.column("df").to_pylist())
        )
        tomb = _pq.read_table(
            _os.path.join(delta_snap, "tombstones")
        ).column("doc_id").to_numpy()
        base = LocalSearcher.from_snapshot(
            base_snap,
            cache_budget_bytes=cache_budget_bytes // 2,
            exclude_docs=tomb,
        )
        delta = LocalSearcher.from_snapshot(
            delta_snap, cache_budget_bytes=cache_budget_bytes // 2
        )
        for s in (base, delta):
            s.override_stats(
                term_df, int(m["merged_n_docs"]), float(m["merged_avgdl"])
            )
        return cls(base, delta)

    @classmethod
    def from_chain(
        cls, newest_snap: str, cache_budget_bytes: int = 1 << 30
    ) -> "SegmentedSearcher":
        """Open a whole Lucene-style segment STACK from its newest
        segment, following the ``segment_of`` links each publish
        recorded (``lifecycle.segment_chain``).  Segment *i* tombstones
        the union of every NEWER segment's superseded doc ids (a doc's
        live version is in the newest segment that carries it), and
        every segment scores with the newest exactly-merged global
        statistics — results bit-identical to a full rebuild over the
        final corpus state, however many update batches were absorbed
        (pytest ``test_segment_stack_equals_rebuild``)."""
        import json as _json
        import os as _os

        import pyarrow.parquet as _pq

        from ..plans.lifecycle import segment_chain

        chain = segment_chain(newest_snap)
        if len(chain) < 2:
            raise ValueError(f"{newest_snap} has no segment_of link")
        with open(_os.path.join(newest_snap, "manifest.json")) as f:
            m = _json.load(f)["metrics"]
        mt = _pq.read_table(
            _os.path.join(newest_snap, "merged_terms"), columns=["term", "df"]
        )
        term_df = dict(
            zip(mt.column("term").to_pylist(), mt.column("df").to_pylist())
        )
        # exclusion list per segment = union of all NEWER tombstones
        excludes: list = [None] * len(chain)
        acc = None
        for i in range(len(chain) - 1, 0, -1):
            excludes[i] = acc
            t = _pq.read_table(
                _os.path.join(chain[i], "tombstones")
            ).column("doc_id").to_numpy()
            acc = t if acc is None else np.union1d(acc, t)
        excludes[0] = acc
        budget = max(1, cache_budget_bytes // len(chain))
        searchers = [
            LocalSearcher.from_snapshot(
                snap, cache_budget_bytes=budget, exclude_docs=excludes[i]
            )
            for i, snap in enumerate(chain)
        ]
        for s in searchers:
            s.override_stats(
                term_df, int(m["merged_n_docs"]), float(m["merged_avgdl"])
            )
        return cls(*searchers)

    def search(
        self,
        query: "str | ParsedQuery",
        k: int = 10,
        operator: str | None = None,
        unordered_slop: bool = False,
    ) -> list[tuple[int, float]]:
        k = min(k, MAX_HITS)
        return merge_topk(
            [
                s.search(
                    query, k=k, operator=operator, unordered_slop=unordered_slop
                )
                for s in self.searchers
            ],
            k,
        )

    def get_document(self, doc_id: int) -> "dict | None":
        """Point lookup across the stack: a doc's live version is in
        the newest segment that holds it — older segments' tombstone
        exclusions make a superseded copy answer ``None``, so the
        newest-first walk returns exactly the rebuilt index's row (or
        ``None`` for deleted ids)."""
        for s in reversed(self.searchers):
            row = s.get_document(doc_id)
            if row is not None:
                return row
        return None


def _edit_le(a: str, b: str, k: int) -> bool:
    """Banded edit-distance ≤ k check."""
    if abs(len(a) - len(b)) > k:
        return False
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        best = dp[0]
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            best = min(best, dp[j])
        if best > k:
            return False
    return dp[-1] <= k


class SnapshotWatcher:
    """Serving-replica hot swap — the replica-side half of the
    reference's alias-swap/refresh flow (``switchIndex`` +
    ``refreshInterval``, ``ElasticsearchClient.java``): wrap a
    :meth:`LocalSearcher.from_snapshot` replica and follow the index
    root's alias as publishes move it.  ``refresh()`` is one
    ``os.stat`` of the alias file (sub-µs when unchanged); when the
    alias mtime moved, the NEW searcher is built completely before the
    reference is swapped, so concurrent readers always see a fully
    loaded index (the same build-then-rename discipline the publisher
    uses on disk).  ``auto=True`` folds the stat into every
    ``search``/``get_document`` call — at ~1 µs per check this is
    noise next to a 0.3 ms query, and a replica then needs no
    out-of-band reload signal at all."""

    def __init__(
        self,
        root: str,
        shard_subset: "list[int] | None" = None,
        cache_budget_bytes: int = 1 << 30,
        auto: bool = True,
    ):
        import os as _os

        self.root = root
        self.shard_subset = shard_subset
        self.cache_budget_bytes = cache_budget_bytes
        self.auto = auto
        self._alias = _os.path.join(root, "manifest.json")
        self._open()

    def _open(self) -> None:
        import os as _os

        from ..plans.lifecycle import current_snapshot

        # stat BEFORE reading the alias: if a publish lands between the
        # stat and the open, the stale mtime just triggers one harmless
        # re-open on the next refresh
        try:
            self._alias_mtime = _os.stat(self._alias).st_mtime_ns
        except FileNotFoundError:
            self._alias_mtime = None
        snap = current_snapshot(self.root)
        if snap is None:
            raise FileNotFoundError(f"no current snapshot under {self.root}")
        self.snapshot = snap
        self.searcher = LocalSearcher.from_snapshot(
            _os.path.join(self.root, "snapshots", snap),
            shard_subset=self.shard_subset,
            cache_budget_bytes=self.cache_budget_bytes,
        )

    def refresh(self) -> bool:
        """Re-open if the alias moved; returns True when a swap
        happened.  Cheap enough to call on every request."""
        import os as _os

        try:
            mtime = _os.stat(self._alias).st_mtime_ns
        except FileNotFoundError:
            return False
        if mtime == self._alias_mtime:
            return False
        # re-open even when the snapshot NAME is unchanged: update mode
        # republishes the same generation with fresh artifacts
        self._open()
        return True

    def search(self, *args, **kwargs):
        if self.auto:
            self.refresh()
        return self.searcher.search(*args, **kwargs)

    def get_document(self, doc_id: int):
        if self.auto:
            self.refresh()
        return self.searcher.get_document(doc_id)
