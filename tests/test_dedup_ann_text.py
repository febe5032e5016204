"""Dedup / similarity / text-analysis operators: semantic unit tests
(the DuckDB cross-engine check lives in test_entry_oracles.py)."""

import math

import pytest
from pyspark.sql import functions as F

from limetrans_spark.functions.text import text_profile
from limetrans_spark.operators import ann, dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup
    (3, "completely different content about spark engines"),
    (4, "der schnelle braune fuchs und die faule katze und der hund ist nicht da"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in dedup.exact_dedup(docs).collect()}
    assert out[1]["canonical_id"] == 0 and out[1]["is_dup"] == 1
    assert out[0]["is_dup"] == 0
    assert out[2]["is_dup"] == 0  # near-dup is NOT an exact dup


def test_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.7
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_exact_and_near(docs):
    cands = {
        (r["id_a"], r["id_b"]): r["n_bands_matched"]
        for r in dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=4).collect()
    }
    assert cands[(0, 1)] == 4  # identical docs collide in every band
    assert not any((a == 3 or b == 3) for a, b in cands)


def test_simhash_properties(docs):
    out = {r["id"]: r["simhash"] for r in dedup.simhash(docs, bits=16).collect()}
    assert out[0] == out[1]  # identical docs → identical fingerprint
    assert len(out[0]) == 16 and set(out[0]) <= {"0", "1"}
    ham_near = sum(a != b for a, b in zip(out[0], out[2]))
    ham_far = sum(a != b for a, b in zip(out[0], out[3]))
    assert ham_near <= ham_far


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.0, 0.9, 0.2], 1),
        (4, [-1.0, 0.0, 0.0], 2),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk(vecs):
    out = ann.cosine_topk(vecs, [1.0, 0.0, 0.0], k=3, exclude_id=0).collect()
    assert [r["id"] for r in out] == [1, 2, 3]
    assert abs(out[0]["cosine"] - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-5


def test_ivf_prunes_to_best_cluster(vecs):
    out = ann.ivf_topk(vecs, [1.0, 0.0, 0.0], k=3, nprobe=1, exclude_id=0).collect()
    assert [r["id"] for r in out] == [1]  # only cluster 0 scanned
    out2 = ann.ivf_topk(vecs, [1.0, 0.0, 0.0], k=3, nprobe=2, exclude_id=0).collect()
    assert [r["id"] for r in out2] == [1, 2, 3]


def test_embedding_near_dup(vecs):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs(vecs, threshold=0.9).collect()
    }
    assert (0, 1) in pairs and all(v >= 0.9 for v in pairs.values())


def test_text_profile(docs):
    prof = {r["doc_id"]: r for r in text_profile(docs).collect()}
    p0 = prof[0]
    assert p0["n_tokens"] == 9
    assert abs(p0["stopword_ratio"] - 2 / 9) < 1e-6  # 'the' ×2; 'over' not a stopword
    assert p0["langid"] == "en"
    assert prof[4]["langid"] == "de"
    assert prof[0]["fingerprint"] == prof[1]["fingerprint"]
    assert prof[0]["fingerprint"] != prof[2]["fingerprint"]
    assert 0.0 <= p0["quality"] <= 1.0


def test_quality_penalizes_punct(spark):
    df = spark.createDataFrame(
        [(0, "clean readable text with many proper words here today"),
         (1, "!!! ### $$$ %%% ^^^ &&& *** ((( )))")],
        "doc_id long, text string",
    )
    prof = {r["doc_id"]: r["quality"] for r in text_profile(df).collect()}
    assert prof[0] > prof[1]
    assert prof[1] == 0.0


def test_ivf_centroid_pruning_and_partition_pruning(spark, tmp_path):
    """IVF probe selection touches only the centroid table, and the data
    scan prunes to the probed clusters: on a label-partitioned parquet
    the physical plan must show partition filters on label, and results
    must equal brute force restricted to the probed clusters."""
    import numpy as np

    from limetrans_spark.operators import ann

    rng = np.random.default_rng(7)
    n, dim, n_clusters = 300, 16, 6
    centers = rng.normal(size=(n_clusters, dim)) * 5
    rows = []
    for i in range(n):
        lbl = int(i % n_clusters)
        v = centers[lbl] + rng.normal(size=dim)
        rows.append((i, [float(x) for x in v], lbl))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    path = str(tmp_path / "emb")
    df.write.partitionBy("label").parquet(path)
    part = spark.read.parquet(path)

    qv = [float(x) for x in centers[2] * 0.9]
    cents = ann.ivf_build(part)
    assert cents.count() == n_clusters
    got = ann.ivf_topk(part, qv, k=5, nprobe=2, centroids=cents).collect()
    assert len(got) == 5
    # nearest cluster must be probed: every hit should come from cluster 2's
    # neighborhood — check against brute force over the same probed set
    plan = part.filter(F.col("label").isin([2, 0]))._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "label" in plan
    # results match exact cosine over probed clusters
    probed = ann.ivf_topk(part, qv, k=300, nprobe=6, centroids=cents).collect()
    exact = ann.cosine_topk(part, qv, k=300).collect()
    assert {(r["id"], r["cosine"]) for r in probed} == {
        (r["id"], r["cosine"]) for r in exact
    }


def test_jaccard_high_df_ceiling_prunes_boilerplate(spark):
    """One ubiquitous token (license boilerplate) must leave the join
    under max_token_df — both the pair candidates and the set sizes."""
    rows = [
        (1, "license alpha beta"),
        (2, "license alpha beta"),
        (3, "license gamma delta"),
        (4, "license epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # without ceiling: every doc pairs with every other via 'license'
    full = dedup.jaccard_pairs(df, threshold=0.0).collect()
    assert len(full) == 6
    # ceiling 3: 'license' (df=4) pruned; only docs sharing real tokens pair
    pruned = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(df, threshold=0.0, max_token_df=3).collect()
    }
    assert set(pruned) == {(1, 2)}
    assert pruned[(1, 2)] == 1.0  # {alpha,beta} == {alpha,beta} after pruning


def test_jaccard_pruned_fallback_matches_collect_path(spark, monkeypatch):
    """When the df-ceiling prunes more terms than the driver-side
    collect cap, jaccard_pairs must fall back to the Spark-side
    semi-join + re-collected feature arrays — with identical output."""
    rows = [
        (1, "license alpha beta common"),
        (2, "license alpha beta common"),
        (3, "license gamma delta common"),
        (4, "license epsilon zeta common"),
        (5, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_collect = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.jaccard_pairs(df, threshold=0.0, max_token_df=3).collect()
    }
    monkeypatch.setattr(dedup, "_PRUNED_COLLECT_CAP", 0)
    via_fallback = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.jaccard_pairs(df, threshold=0.0, max_token_df=3).collect()
    }
    assert via_fallback == via_collect
    assert via_fallback  # non-trivial: (1,2) survives the pruning


def test_embedding_lsh_pairs_no_cartesian_and_subset_of_exact(spark):
    import numpy as np

    from limetrans_spark.operators import dedup as dd

    rng = np.random.default_rng(3)
    base = rng.normal(size=24)
    rows = []
    for i in range(40):
        v = base + rng.normal(size=24) * (0.05 if i % 2 == 0 else 3.0)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = dd.embedding_lsh_pairs(df, threshold=0.9, n_planes=8, bands=4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, "LSH path must not cross-join"
    lsh = {(r["id_a"], r["id_b"]) for r in got.collect()}
    exact = {
        (r["id_a"], r["id_b"])
        for r in dd.embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    assert lsh <= exact          # no false positives (exact cosine re-check)
    assert len(lsh) >= 0.5 * len(exact) and exact  # sane recall on clustered data


def test_ivf_train_kmeans_deterministic_and_pure(spark):
    """Lloyd's trainer: recovers planted clusters, deterministic across
    partitionings, and feeds ivf_topk end-to-end without labels."""
    import numpy as np

    from limetrans_spark.operators import ann

    rng = np.random.default_rng(11)
    k, dim = 4, 12
    centers = rng.normal(size=(k, dim)) * 10
    rows = [
        (i, [float(x) for x in centers[i % k] + rng.normal(size=dim) * 0.1])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assign = ann.ivf_train(df, k=4, n_iters=4)
    labels = {r["id"]: r["label"] for r in assign.collect()}
    # purity: every planted cluster maps to exactly one learned label
    mapping = {}
    for i, lbl in labels.items():
        mapping.setdefault(i % k, set()).add(lbl)
    assert all(len(s) == 1 for s in mapping.values())
    assert len({next(iter(s)) for s in mapping.values()}) == k

    # determinism across partitionings
    cents2, assign2 = ann.ivf_train(df.repartition(7), k=4, n_iters=4)
    assert cents == cents2
    assert labels == {r["id"]: r["label"] for r in assign2.collect()}

    # end-to-end: trained labels drive the pruned search; probing all
    # clusters reproduces exact brute force
    labeled = df.join(assign.withColumnRenamed("id", "vec_id"), "vec_id")
    qv = [float(x) for x in centers[1]]
    pruned = ann.ivf_topk(labeled, qv, k=200, nprobe=4).collect()
    exact = ann.cosine_topk(df, qv, k=200).collect()
    assert {(r["id"], r["cosine"]) for r in pruned} == {
        (r["id"], r["cosine"]) for r in exact
    }
    top = ann.ivf_topk(labeled, qv, k=5, nprobe=1).collect()
    assert all(r["id"] % 4 == 1 for r in top)  # nearest cluster probed


def test_dedup_releases_intermediate_caches(spark, docs, vecs):
    """jaccard_pairs / embedding_lsh_pairs must not leak session-lifetime
    storage blocks: intermediates are unpersisted internally, and after
    the caller releases the returned (materialized) result, no persistent
    RDDs remain beyond what existed before the call."""

    def persisted_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    before = persisted_ids()
    out = dedup.jaccard_pairs(docs, threshold=0.5, ngram=3)
    out.collect()
    out.unpersist(blocking=True)
    assert persisted_ids() == before

    out2 = dedup.embedding_lsh_pairs(vecs, threshold=0.3, n_planes=8, bands=4)
    out2.collect()
    out2.unpersist(blocking=True)
    assert persisted_ids() == before


def test_grid_block_count_sizing():
    """Pure arithmetic of the blocked-grid sizing (round-6 pair-work
    floor): env override wins, √parallelism base with floor 8, the
    data-adaptive floor binds only when 2·Σdf²/B² would exceed the
    ~2²⁵-key per-cell budget, and replication is capped at 256."""
    # env override wins outright (but never below 2)
    assert dedup._grid_block_count(32, "5", 1e12) == 5
    assert dedup._grid_block_count(32, "1", None) == 2
    # base: ceil(2·√par), floored at 8
    assert dedup._grid_block_count(32, None, None) == 12
    assert dedup._grid_block_count(4, None, None) == 8
    assert dedup._grid_block_count(4, None, 0.0) == 8
    # pair-work floor inactive while 2·pw/2²⁵ ≤ base²
    assert dedup._grid_block_count(32, None, float(1 << 25)) == 12
    # active: pw = 8·2²⁵ → √(2·8·2²⁵/2²⁵) = 4 < 12 (still base);
    # pw = 200²·2²⁵/2 → floor exactly 200
    assert dedup._grid_block_count(32, None, (200**2) * float(1 << 25) / 2.0) == 200
    # capped at 256 no matter the estimate
    assert dedup._grid_block_count(32, None, 1e30) == 256


def test_jaccard_pairs_invariant_to_block_count(spark, monkeypatch):
    """The grid is an exact all-pairs partitioning: output must be
    identical (ids AND jaccard doubles) for any block count."""
    rows = [(i, f"alpha beta gamma{'x' if i % 3 == 0 else ''} tok{i % 4} d{i}") for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    baseline = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.jaccard_pairs(df, threshold=0.1).collect()
    }
    assert baseline  # non-trivial corpus
    for b in ("2", "7"):
        monkeypatch.setenv("LIMETRANS_JACCARD_BLOCKS", b)
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.jaccard_pairs(df, threshold=0.1).collect()
        }
        assert got == baseline, f"block count {b} changed the pair set"
    monkeypatch.delenv("LIMETRANS_JACCARD_BLOCKS")


def test_jaccard_shingle_auto_ceiling_and_exact_optin(spark):
    """ngram mode defaults to a df-ceiling (auto = max(16, n//20));
    max_token_df=None opts back into exact shingle Jaccard."""
    rows = [(i, "common boiler plate " + ("x%d y%d z%d " % (i, i, i))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every doc shares the 'common boiler plate' shingle → df=30 > 16:
    # auto mode prunes it, so no pair reaches any threshold
    auto = dedup.jaccard_pairs(df, threshold=0.01, ngram=3)
    assert auto.count() == 0
    auto.unpersist()
    # exact opt-in keeps the boilerplate shingle → all pairs share it
    exact = dedup.jaccard_pairs(df, threshold=0.01, ngram=3, max_token_df=None)
    assert exact.count() == 30 * 29 // 2
    exact.unpersist()


def test_jaccard_prefix_filter_equals_exact(spark):
    """PPJoin prefix filtering is a pure candidate-generation cut: the
    verified output must equal the exact plan's output — same pairs,
    same jaccard values — at every threshold."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, rng.randint(5, 14))
        rows.append((i, " ".join(base)))
        if i % 4 == 0:  # planted near-dups
            mut = list(base)
            if len(mut) > 6:
                mut[0] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(mut)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.6, 0.9):
        exact = dedup.jaccard_pairs(df, threshold=t, max_token_df=None)
        fast = dedup.jaccard_pairs(df, threshold=t, max_token_df=None, prefix_filter=True)
        a = sorted(map(tuple, exact.collect()))
        b = sorted(map(tuple, fast.collect()))
        exact.unpersist()
        fast.unpersist()
        assert a == b, (t, len(a), len(b))
        assert len(a) > 0  # the fixture plants matches at every threshold


def test_near_dup_clusters(spark):
    """Min-label propagation resolves pair graphs into components:
    chains propagate to the component minimum, isolated nodes keep
    their own id, and the non-convergence guard raises."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "doc_id long")
    out = dedup.near_dup_clusters(pairs, ids)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    out.unpersist()
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}
    # a 6-chain cannot finish in 1 round
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    cids = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup.near_dup_clusters(chain, cids, max_iter=1)


def test_jaccard_unigram_auto_ceiling(spark):
    """Round-4 default change: 'auto' applies max(16, n//20) in EVERY
    mode (unigram included) — a hot token above the ceiling leaves the
    join, and Jaccard is over the pruned sets, mirrored here by a pure-
    Python oracle. Exactness now needs an explicit max_token_df=None."""
    n = 400
    # every doc shares the hot token 'common' (df=400 > ceiling=20);
    # pairs (2i, 2i+1) share a rare token pair
    rows = [
        (i, f"common w{i // 2}a w{i // 2}b u{i}")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.jaccard_pairs(df, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    out.unpersist()
    # oracle: pruned sets are {wKa, wKb, uI} → each (2k, 2k+1) pair has
    # |A∩B|=2, |A∪B|=4 → J=0.5; nothing else shares ≥ half
    want = {(2 * k, 2 * k + 1): 0.5 for k in range(n // 2)}
    assert got == want
    # exact opt-in: the hot token re-enters every set, J = 3/5 < ... no:
    # sets are {common, wKa, wKb, uI}: inter=3, union=5 → 0.6 ≥ 0.5
    out2 = dedup.jaccard_pairs(df, threshold=0.5, max_token_df=None)
    got2 = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out2.collect()}
    out2.unpersist()
    assert got2 == {(2 * k, 2 * k + 1): 0.6 for k in range(n // 2)}


def test_near_dup_clusters_chain_graph_lineage(spark):
    """Regression (round 4): a CHAIN component needs ~n rounds of label
    propagation; each round's plan references the previous labels twice,
    so without per-round lineage truncation the analyzed plan doubled
    per round and a ~25-round chain OOM'd the driver.  25-node chain →
    every node must resolve to label 0 within the round budget."""
    n = 25
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = dedup.near_dup_clusters(pairs, ids, max_iter=n + 2)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {i: 0 for i in range(n)}


def test_near_dup_clusters_union_find_at_scale(spark):
    """Scale-honest clustering gate (round-5): a NON-degenerate pair
    graph — 10k nodes in mixed components (cliques, long chains, stars,
    singletons) — resolved by the engine must equal a plain union-find
    over the same edges.  This covers the unbounded path the
    ``dedup_clusters`` correctness gate bounds to 1000 docs, and the
    long chains exercise the large-star/small-star round bound (the
    2000-node path must converge well inside max_iter=30; the
    alternation takes ~10 rounds on this graph)."""
    import random

    rng = random.Random(7)
    n = 10_000
    edges = []
    # 100 cliques of 8
    base = 0
    for _ in range(100):
        members = list(range(base, base + 8))
        edges += [(a, b) for a in members for b in members if a < b]
        base += 8
    # one 2000-node chain (diameter stress)
    chain = list(range(base, base + 2000))
    edges += list(zip(chain, chain[1:]))
    base += 2000
    # 50 stars of 20
    for _ in range(50):
        hub = base
        edges += [(hub, base + i) for i in range(1, 20)]
        base += 20
    # random extra edges among a middle slice
    for _ in range(500):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long").repartition(16)

    out = dedup.near_dup_clusters(pairs, ids, max_iter=30)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}

    # oracle: union-find with path compression
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: component label = min id (find gives the min because
    # unions always attach the larger root under the smaller)
    want = {i: find(i) for i in range(n)}
    assert got == want
