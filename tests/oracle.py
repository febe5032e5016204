"""Single-process pure-Python oracle for the index + BM25 engine.

Mirrors the reference's golden-output testing discipline
(``AbstractTransformationTest.java:80-83``: run the pipeline, compare
against an independently produced expectation).  The oracle shares ONLY
the tokenizer function with the engine; doc-ID assignment, tf/df/dl
accounting, BM25 math, and ranking are re-implemented independently so a
bug in the Spark pipeline cannot self-certify.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from dataclasses import dataclass

from limetrans_spark.functions.analysis import code_doc_length, code_tokenize_py

K1, B = 1.2, 0.75


def hash_bucket(key: str, num_buckets: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % num_buckets


def assign_ids_py(rows: list[dict], keys=("repo", "path", "commit"),
                  num_buckets: int = 64) -> dict[tuple, int]:
    """Python twin of operators.build.assign_doc_ids(mode='hash')."""
    buckets: dict[int, list[tuple]] = defaultdict(list)
    for r in rows:
        kt = tuple(r[k] for k in keys)
        b = hash_bucket("\x1f".join(kt), num_buckets)
        buckets[b].append(kt)
    ids: dict[tuple, int] = {}
    nxt = 0
    for b in sorted(buckets):
        for kt in sorted(buckets[b]):
            ids[kt] = nxt
            nxt += 1
    return ids


@dataclass
class OracleIndex:
    n_docs: int
    avgdl: float
    dl: dict[int, int]
    tf: dict[str, dict[int, int]]  # term -> doc -> tf
    pos: dict[str, dict[int, list[int]]]

    @classmethod
    def build(cls, docs: dict[int, str]) -> "OracleIndex":
        tf: dict[str, dict[int, int]] = defaultdict(dict)
        pos: dict[str, dict[int, list[int]]] = defaultdict(dict)
        dl: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = code_tokenize_py(text)
            dl[doc_id] = code_doc_length(toks)
            counts = Counter(t for t, _ in toks)
            for t, c in counts.items():
                tf[t][doc_id] = c
            byterm = defaultdict(list)
            for t, p in toks:
                byterm[t].append(p)
            for t, ps in byterm.items():
                pos[t][doc_id] = sorted(ps)
        n = len(docs)
        avgdl = sum(dl.values()) / n if n else 0.0
        return cls(n, avgdl, dl, dict(tf), dict(pos))

    def idf(self, term: str) -> float:
        df = len(self.tf.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def contrib(self, term: str, doc: int) -> float:
        t = self.tf.get(term, {}).get(doc)
        if not t:
            return 0.0
        norm = K1 * (1 - B + B * self.dl[doc] / self.avgdl)
        return self.idf(term) * t * (K1 + 1.0) / (t + norm)

    def score(self, terms: list[str], doc: int) -> float:
        return sum(self.contrib(t, doc) for t in sorted(set(terms)))

    def docs_with(self, term: str) -> set[int]:
        return set(self.tf.get(term, {}))

    def phrase_docs(self, terms: list[str]) -> set[int]:
        out = set()
        cands = set.intersection(*(self.docs_with(t) for t in terms)) if terms else set()
        for d in cands:
            ends = set(self.pos[terms[0]][d])
            for t in terms[1:]:
                ends = {p for p in self.pos[t][d] if (p - 1) in ends}
                if not ends:
                    break
            if ends:
                out.add(d)
        return out

    def sloppy_phrase_docs(self, terms: list[str], slop: int) -> set[int]:
        """Order-preserving occurrence selection with total extra gap ≤
        ``slop`` — brute-force DFS over position combinations, deliberately
        independent of the engine's prefix-max DP."""
        out = set()
        cands = set.intersection(*(self.docs_with(t) for t in terms)) if terms else set()
        for d in cands:
            pos_lists = [self.pos[t][d] for t in terms]

            def ok(i: int, prev: int, used: int) -> bool:
                if i == len(pos_lists):
                    return True
                return any(
                    p > prev
                    and used + (p - prev - 1) <= slop
                    and ok(i + 1, p, used + (p - prev - 1))
                    for p in pos_lists[i]
                )

            if any(ok(1, p, 0) for p in pos_lists[0]):
                out.add(d)
        return out

    def unordered_sloppy_phrase_docs(self, terms: list[str], slop: int) -> set[int]:
        """Lucene-style out-of-order NEAR: some per-term occurrence choice
        has adjusted-position span ``max(pᵢ−i) − min(pᵢ−i) ≤ slop`` —
        exhaustive product over occurrence combinations, deliberately
        independent of the engine's window sweep."""
        import itertools

        assert len(set(terms)) == len(terms), "repeats undefined for unordered slop"
        out = set()
        cands = set.intersection(*(self.docs_with(t) for t in terms)) if terms else set()
        for d in cands:
            adj = [[p - i for p in self.pos[t][d]] for i, t in enumerate(terms)]
            if any(max(c) - min(c) <= slop for c in itertools.product(*adj)):
                out.add(d)
        return out

    def topk(self, terms: list[str], k: int, operator: str = "and",
             candidates: set[int] | None = None) -> list[tuple[int, float]]:
        terms = sorted(set(terms))
        if candidates is None:
            sets = [self.docs_with(t) for t in terms]
            candidates = (
                set.intersection(*sets) if operator == "and" and sets
                else set.union(*sets) if sets else set()
            )
        scored = [(d, self.score(terms, d)) for d in candidates]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
