"""Query semantics vs the pure-Python oracle — the analogue of the
reference's parameterized query suite (``ElasticsearchQueryTest.java:169-298``):
boolean membership, phrase, prefix, and rank-identical BM25 top-k with
scores to 1e-9, across the DataFrame path and the sharded WAND/TAAT paths."""

import pytest

from limetrans_spark.operators import query as Q
from limetrans_spark.operators.build import build_index
from limetrans_spark.sources.corpus import synth_corpus

N_DOCS = 120
ATOL = 1e-9


@pytest.fixture(scope="module")
def index(spark):
    corpus = synth_corpus(spark, N_DOCS, max_tokens=300, partitions=4)
    idx = build_index(corpus, shard_size=32)
    idx.shards.persist()
    idx.docstore.persist()
    return idx


@pytest.fixture(scope="module")
def oracle(index):
    from tests.oracle import OracleIndex

    rows = index.docstore.select("doc_id", "content").collect()
    return OracleIndex.build({r["doc_id"]: r["content"] for r in rows})


RANKED_QUERIES = [
    "tokenize",
    "tokenize score",
    "parse json",
    "license warranties",
    "if return",  # stop-like high-DF terms
]


def assert_topk_equal(got, want):
    assert [g["doc_id"] for g in got] == [d for d, _ in want]
    for g, (_, s) in zip(got, want):
        assert abs(g["score"] - s) < ATOL


@pytest.mark.parametrize("q", RANKED_QUERIES)
def test_bm25_df_path_matches_oracle(index, oracle, q):
    terms = []
    for tok in q.split():
        terms.extend(Q.parse_query(tok).positive_terms)
    want = oracle.topk(terms, 10, operator="and")
    got = Q.bm25_topk_df(index, q, k=10).collect()
    assert_topk_equal(got, want)


@pytest.mark.parametrize("q", ["tokenize score", "license warranties"])
@pytest.mark.parametrize("algorithm", ["wand", "taat"])
def test_bm25_sharded_or_matches_oracle(index, oracle, q, algorithm):
    terms = q.split()
    want = oracle.topk(terms, 10, operator="or")
    got = Q.bm25_topk_sharded(index, q, k=10, operator="or", algorithm=algorithm).collect()
    assert_topk_equal(got, want)


def test_bm25_sharded_and_matches_oracle(index, oracle):
    want = oracle.topk(["tokenize", "score"], 10, operator="and")
    got = Q.bm25_topk_sharded(index, "tokenize score", k=10, operator="and").collect()
    assert_topk_equal(got, want)


def test_graph_equivalence_queries(index):
    """parse-json ≈ parse json ≈ parsejson doc sets (reference hyphen matrix)."""
    a = {r["doc_id"] for r in Q.matching_docs_df(index, "parse json").collect()}
    b = {r["doc_id"] for r in Q.matching_docs_df(index, "parse-json").collect()}
    assert a == b and a


def test_boolean_not(index, oracle):
    got = {r["doc_id"] for r in Q.matching_docs_df(index, "tokenize -license").collect()}
    want = oracle.docs_with("tokenize") - oracle.docs_with("license")
    assert got == want


def test_boolean_or_group(index, oracle):
    got = {r["doc_id"] for r in Q.matching_docs_df(index, "varintencode | deltagap").collect()}
    want = oracle.docs_with("varintencode") | oracle.docs_with("deltagap")
    assert got == want


def test_phrase(index, oracle):
    got = {r["doc_id"] for r in Q.matching_docs_df(index, '"applicable law"').collect()}
    want = oracle.phrase_docs(["applicable", "law"])
    assert got == want and got  # license docs exist


def test_phrase_no_false_adjacency(index, oracle):
    # both terms common, adjacency rare: oracle decides
    got = {r["doc_id"] for r in Q.matching_docs_df(index, '"score tokenize"').collect()}
    assert got == oracle.phrase_docs(["score", "tokenize"])


def test_prefix(index, oracle):
    got = {r["doc_id"] for r in Q.matching_docs_df(index, "varint*").collect()}
    want = set()
    for t in oracle.tf:
        if t.startswith("varint"):
            want |= oracle.docs_with(t)
    assert got == want and got


def test_prefix_no_vocab_match_empty_on_all_tiers(index):
    # a positive clause that expands to ZERO dictionary terms must mean
    # "matches nothing" on every tier — not an error, and not match_all
    # (the sharded/serving guards used to raise "requires a positive
    # clause" here, diverging from the DF tier's empty result)
    for q in ("zzzznope*", "zzzznope* -tokenize"):
        assert Q.bm25_topk_df(index, q, k=5).collect() == []
        assert Q.bm25_topk_sharded(index, q, k=5).collect() == []
    # pure-negative / empty queries keep their match_all semantics
    with pytest.raises(ValueError, match="positive clause"):
        Q.bm25_topk_sharded(index, "-tokenize", k=5)


def test_match_all(index):
    got = Q.bm25_topk_df(index, "", k=1000).collect()
    assert len(got) == N_DOCS


def test_k_cap(index):
    got = Q.bm25_topk_df(index, "if", k=99999).collect()
    assert len(got) <= Q.MAX_HITS


def test_parallelism_rank_identity(spark, index):
    """north_rule: identical ranks + scores at different parallelism.

    Rebuild the same corpus with different partitioning/shuffle width and
    compare full top-20 (ids AND scores bit-for-bit)."""
    corpus2 = synth_corpus(spark, N_DOCS, max_tokens=300, partitions=7)
    idx2 = build_index(corpus2, shard_size=32)
    q = "tokenize score license"
    a = Q.bm25_topk_df(index, q, k=20).collect()
    b = Q.bm25_topk_df(idx2, q, k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    c = Q.bm25_topk_sharded(idx2, "tokenize | score", k=20).collect()
    d = Q.bm25_topk_sharded(index, "tokenize | score", k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in c] == [
        (r["doc_id"], r["score"]) for r in d
    ]


# ---------------------------------------------------------------------------
# WAND vs exact TAAT on multi-block posting lists (pure NumPy, no Spark).
#
# Round-1 regression: the block-max skip advanced the lowest list past its
# OWN block end without capping at the other prefix lists' block boundaries
# or the first suffix list's current doc, silently dropping contributions at
# production shard sizes (the oracle gates use single-block shards, which
# never exercise the skip).  This test uses shards of thousands of docs —
# dozens of 128-entry blocks per list — with spiky tfs so block maxes vary
# wildly and the skip fires constantly.
# ---------------------------------------------------------------------------


def _rand_plists(rng, shard_size, n_terms, base):
    import numpy as np

    from limetrans_spark.operators import codec

    plists = {}
    for ti in range(n_terms):
        density = rng.uniform(0.05, 0.9)
        docs = base + np.nonzero(rng.random(shard_size) < density)[0].astype(np.int64)
        if docs.size == 0:
            continue
        # spiky tfs: mostly 1-3, occasional 50-200 spikes → wild block maxes
        tfs = rng.integers(1, 4, size=docs.size).astype(np.int64)
        spikes = rng.random(docs.size) < 0.02
        tfs[spikes] = rng.integers(50, 200, size=int(spikes.sum()))
        _, _, blast, bmax_tf = codec.encode_postings(docs, tfs, base=base)
        plists[f"t{ti:02d}"] = {
            "docs": docs,
            "tfs": tfs,
            "block_last": np.asarray(blast, dtype=np.int64),
            "block_max_tf": np.asarray(bmax_tf, dtype=np.int64),
            "pos_blob": b"",
        }
    return plists


def test_wand_multiblock_matches_taat_randomized():
    import numpy as np

    rng = np.random.default_rng(20260816)
    avgdl = 120.0
    for trial in range(60):
        shard_size = int(rng.integers(1500, 4000))
        base = int(rng.integers(0, 5)) * shard_size
        n_terms = int(rng.integers(2, 6))
        k = int(rng.choice([3, 10, 25]))
        plists = _rand_plists(rng, shard_size, n_terms, base)
        if not plists:
            continue
        dl = np.zeros(shard_size, dtype=np.float64)
        # docs referenced by any posting must have a real (nonzero) length
        used = np.unique(np.concatenate([p["docs"] for p in plists.values()])) - base
        dl[used] = rng.integers(20, 400, size=used.size)
        idfs = {t: Q.bm25_idf(10000, int(p["docs"].size)) for t, p in plists.items()}
        scores, nmatch = Q._taat_scores(plists, idfs, dl, base, avgdl)
        cand = np.nonzero(nmatch > 0)[0]
        order = np.lexsort((cand, -scores[cand]))[:k]
        want = list(zip((cand[order] + base).tolist(), scores[cand][order].tolist()))
        d, s = Q._wand_topk(plists, idfs, dl, base, avgdl, k)
        got = list(zip(d.tolist(), s.tolist()))
        assert len(got) == len(want), f"trial {trial}: {len(got)} != {len(want)}"
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gd == wd and abs(gs - ws) < ATOL, (
                f"trial {trial}: got ({gd},{gs}) want ({wd},{ws})"
            )


def test_default_operator_consistent_across_paths(index):
    """Same query string with DEFAULT args → same docs AND scores on all
    three execution paths (the reference pins default_operator=and,
    ElasticsearchQueryTest.java:52; round-1 regression: the sharded path
    defaulted to OR and ignored group structure for flat queries)."""
    from limetrans_spark.operators.serve import LocalSearcher

    searcher = LocalSearcher.from_index(index)
    for q in ["tokenize score", "tokenize | score", "parse json | license"]:
        a = [(r["doc_id"], r["score"]) for r in Q.bm25_topk_df(index, q, k=15).collect()]
        b = [
            (r["doc_id"], r["score"])
            for r in Q.bm25_topk_sharded(index, q, k=15).collect()
        ]
        c = [(d, s) for d, s in searcher.search(q, k=15)]
        assert [d for d, _ in a] == [d for d, _ in b] == [d for d, _ in c], q
        for (_, sa), (_, sb), (_, sc) in zip(a, b, c):
            assert abs(sa - sb) < ATOL and abs(sa - sc) < ATOL, q


def test_phrase_slop_matches_bruteforce_oracle(index, oracle):
    """NEAR semantics ('"a b"~N', ElasticsearchQueryTest.java:53): the
    engine's prefix-max DP vs the oracle's independent brute-force DFS,
    on all three tiers.  Matches are order-preserving with total extra
    gap ≤ N (documented deviation: Lucene's out-of-order moves are
    excluded on every tier and in the oracle alike)."""
    from limetrans_spark.operators.serve import LocalSearcher

    searcher = LocalSearcher.from_index(index)
    cases = [
        (("applicable", "law"), 0),
        (("applicable", "law"), 2),
        (("parse", "json"), 1),
        (("parse", "json"), 3),
        (("tokenize", "score"), 2),
        (("if", "return"), 1),
        (("parse", "json", "fast"), 2),
    ]
    for terms, slop in cases:
        qs = '"' + " ".join(terms) + f'"~{slop}'
        want = oracle.sloppy_phrase_docs(list(terms), slop)
        got_df = {r["doc_id"] for r in Q.matching_docs_df(index, qs).collect()}
        assert got_df == want, (qs, "df")
        got_sh = {
            r["doc_id"] for r in Q.bm25_topk_sharded(index, qs, k=1000).collect()
        }
        assert got_sh == want, (qs, "sharded")
        got_sv = {d for d, _ in searcher.search(qs, k=1000)}
        assert got_sv == want, (qs, "serving")


def test_phrase_slop_monotone_and_zero_equals_exact(index, oracle):
    """slop=0 ≡ the exact-adjacency path; doc sets grow monotonically in
    slop; and a slop window wide enough to cover the doc's length admits
    every co-occurrence pair."""
    for terms in [("applicable", "law"), ("parse", "json")]:
        lterms = list(terms)
        base = '"' + " ".join(terms) + '"'
        exact = {r["doc_id"] for r in Q.matching_docs_df(index, base).collect()}
        s0 = {r["doc_id"] for r in Q.matching_docs_df(index, base + "~0").collect()}
        assert s0 == exact == oracle.phrase_docs(lterms)
        prev = s0
        for slop in (1, 2, 5):
            cur = {
                r["doc_id"]
                for r in Q.matching_docs_df(index, base + f"~{slop}").collect()
            }
            assert prev <= cur, slop
            prev = cur
    # slop in a boolean composition: sloppy phrase AND a term, negated sloppy
    got = {
        r["doc_id"]
        for r in Q.matching_docs_df(index, '"parse json"~2 -license').collect()
    }
    want = oracle.sloppy_phrase_docs(["parse", "json"], 2) - oracle.docs_with("license")
    assert got == want


def test_unordered_slop_vector_pair(spark):
    """The flag-gated Lucene out-of-order NEAR vs the default ordered
    NEAR, proven as a vector PAIR on the same corpus: ``"a b"~2``
    matches the reversal ``b a`` only with ``unordered_slop=True``
    (adjusted-position span ≤ slop — a reversal of adjacent terms costs
    2 slop, exactly Lucene's SloppyPhraseScorer charge), identically on
    the DF, sharded, and serving tiers."""
    from limetrans_spark.operators.build import build_index
    from limetrans_spark.operators.serve import LocalSearcher

    docs = [
        "b a zz",        # 0: reversal, span 2
        "a x b zz",      # 1: ordered gap 1
        "a b zz",        # 2: adjacent
        "b x x a zz",    # 3: reversal, span 4
        "a zz",          # 4: missing b
        "c b zz a",      # 5: b@1 a@3 → span 3
    ]
    corpus = spark.createDataFrame(
        [(i, "r", "p", "c", "txt", t) for i, t in enumerate(docs)],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    idx = build_index(corpus, shard_size=3)
    searcher = LocalSearcher.from_index(idx)
    # (query, ordered docs, unordered docs) — a strict-difference pair per slop
    cases = [
        ('"a b"~1', {1, 2}, {1, 2}),
        ('"a b"~2', {1, 2}, {0, 1, 2}),
        ('"a b"~3', {1, 2}, {0, 1, 2, 5}),
        ('"a b"~4', {1, 2}, {0, 1, 2, 3, 5}),
        ('"b a"~2', {0, 3, 5}, {0, 2, 3, 5}),
    ]
    for qs, want_ord, want_uno in cases:
        for unordered, want in ((False, want_ord), (True, want_uno)):
            pq = Q.parse_query(qs, unordered_slop=unordered)
            got_df = {r["doc_id"] for r in Q.matching_docs_df(idx, pq).collect()}
            got_sh = {r["doc_id"] for r in Q.bm25_topk_sharded(idx, pq, k=100).collect()}
            got_sv = {d for d, _ in searcher.search(pq, k=100)}
            assert got_df == got_sh == got_sv == want, (qs, unordered)
    # the serving tier's own parse path honors the flag on string queries
    assert {d for d, _ in searcher.search('"a b"~2', k=100, unordered_slop=True)} == {0, 1, 2}
    # repeated phrase terms reject the flag (Lucene's repeats handling is
    # heuristic — out of scope, and silently-wrong answers are worse)
    with pytest.raises(ValueError, match="repeated"):
        Q.parse_query('"a b a"~2', unordered_slop=True)
    with pytest.raises(ValueError, match="repeated"):
        Q.phrase_match_df(idx.postings, ("a", "b", "a"), slop=2, in_order=False)


def test_unordered_slop_corpus_matches_bruteforce_oracle(index, oracle):
    """Unordered NEAR on the realistic synth corpus vs the oracle's
    independent occurrence-product brute force, all three tiers; the
    ordered result is always a subset at equal slop."""
    from limetrans_spark.operators.serve import LocalSearcher

    searcher = LocalSearcher.from_index(index)
    cases = [
        (("applicable", "law"), 2),
        (("parse", "json"), 1),
        (("parse", "json"), 3),
        (("tokenize", "score"), 2),
        (("parse", "json", "fast"), 2),
    ]
    for terms, slop in cases:
        qs = '"' + " ".join(terms) + f'"~{slop}'
        want = oracle.unordered_sloppy_phrase_docs(list(terms), slop)
        pq = Q.parse_query(qs, unordered_slop=True)
        got_df = {r["doc_id"] for r in Q.matching_docs_df(index, pq).collect()}
        assert got_df == want, (qs, "df")
        got_sh = {r["doc_id"] for r in Q.bm25_topk_sharded(index, pq, k=1000).collect()}
        assert got_sh == want, (qs, "sharded")
        got_sv = {d for d, _ in searcher.search(pq, k=1000)}
        assert got_sv == want, (qs, "serving")
        assert oracle.sloppy_phrase_docs(list(terms), slop) <= want, (qs, "subset")


def test_prefix_fuzzy_expansion_cap_binds(spark):
    """The 128-term expansion cap (MAX_PREFIX_EXPANSIONS) actually
    exercised: 300 terms share the prefix; the engine must score/match
    exactly the top-128 by (df DESC, term) — the same policy the gate
    oracles now embed — identically on all three tiers."""
    from limetrans_spark.operators.build import build_index
    from limetrans_spark.operators.serve import LocalSearcher

    # term pXXX appears in docs 0..(i % 7): df varies 1..7, ties broken
    # by term string; every doc also has a filler token
    rows = []
    n_terms, n_docs = 300, 140
    for d in range(n_docs):
        toks = ["filler"]
        for t in range(n_terms):
            if d <= t % 7:
                toks.append(f"p{t:03d}")
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, content string")
    idx = build_index(df, analyzer="simple", shard_size=64)

    # expected expansion: top 128 by (df desc, term asc)
    dfs = {f"p{t:03d}": (t % 7) + 1 for t in range(n_terms)}
    exp = sorted(sorted(dfs), key=lambda t: (-dfs[t], t))[:128]
    assert len(set(exp)) == 128
    want = {d for t in exp for d in range(dfs[t])}

    got_df = {r["doc_id"] for r in Q.matching_docs_df(idx, "p*").collect()}
    got_sh = {r["doc_id"] for r in Q.bm25_topk_sharded(idx, "p*", k=1000).collect()}
    srv = LocalSearcher.from_index(idx)
    got_sv = {d for d, _ in srv.search("p*", k=1000)}
    assert got_df == got_sh == got_sv == want

    # with df ties everywhere, the cap selects p000..p127 under a uniform
    # corpus; fuzzy banding honors the same cap (q~1 over 1-char terms)
    assert Q._expand_prefix(idx, "p") == sorted(exp)
