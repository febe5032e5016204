#!/usr/bin/env python
"""Gate-scale probe beyond sf0.1: a 100k-doc / 20k-vocab corpus
(sources.corpus.rich_corpus) driven through the paths whose caps and
skew handling only BIND at realistic vocabulary sizes — the round-4
verdict's "Next round #8".

Checks (each an assertion, not just a timing):
  * build_index over 100k docs; DF-tier vs sharded WAND rank identity
    on common/rare/mixed queries (the core engine invariant at a scale
    where block-max pruning actually skips blocks);
  * prefix expansion: the top-128-by-df cap BINDS (matching vocab >
    128) and both tiers agree under it;
  * exact dedup finds the planted ~5% duplicate rows;
  * serving tier: publish the snapshot, open it WITHOUT Spark (full +
    1/16-slice replica), rank-identical to the WAND tier, replica
    scores equal the full searcher's (global statistics), and two
    complementary half-replicas merge_topk to EXACTLY the full top-k;
  * MinHash-LSH candidates ⊇ planted exact dups (recall on true dups);
  * near_dup_clusters on the LSH pair graph == driver union-find.

Prints ONE JSON line (timings + invariant booleans + host-noise probe);
the transcript is committed per round as BENCH/scale_probe_r{N}.json.

Run: python tools/scale_probe.py [n_docs] (default 100000)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import noise_probe  # noqa: E402
from limetrans_spark.operators import dedup  # noqa: E402
from limetrans_spark.operators import query as Q  # noqa: E402
from limetrans_spark.operators.build import build_index  # noqa: E402
from limetrans_spark.session import get_spark  # noqa: E402
from limetrans_spark.sources.corpus import rich_corpus  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    return out, dt


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(n_docs: int = 100_000, index_only: bool = False) -> int:
    """``index_only=True`` runs the shuffle-bounded paths (build, rank
    identity, prefix cap, exact dedup) and skips the MinHash/cluster
    sections whose driver-side union-find ORACLE collects the candidate
    pair list — ~10.9 M pairs at 100 k docs, O(n²)-ish at 1 M.  The
    engine side of those paths is bucketed and would run; it is the
    verification harness that cannot, so the probe says so instead of
    pretending (use the default mode at 100 k for the full oracle)."""
    probes = [noise_probe()]
    res: dict = {"metric": "scale-probe", "n_docs": n_docs, "vocab": 20_000,
                 "index_only": index_only}
    spark = get_spark(
        app_name="scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = rich_corpus(spark, n_docs, vocab=20_000, partitions=32).persist()
    _, t_gen = timed(docs.count)
    res["gen_sec"] = round(t_gen, 2)
    log(f"gen {t_gen:.1f}s")

    # --- build + rank identity -------------------------------------------
    idx, t_build = timed(
        lambda: build_index(docs, text_col="text", analyzer="simple",
                            shard_size=1 << 13)
    )
    idx.postings.persist().count()
    # warm-path policy matches bench.py: the compressed shards / term
    # dictionary / doclen blobs are build-time artifacts (published
    # parquet in production) — persist them so the sharded-WAND timings
    # measure QUERY work, not a per-query re-encode of the whole index
    idx.shards.persist().count()
    idx.terms.persist().count()
    idx.doclens.persist().count()
    res["build_sec"] = round(t_build, 2)
    res["build_docs_per_sec"] = round(n_docs / t_build, 1)
    log(f"build {t_build:.1f}s")

    rank_ok = True
    q_times = {}
    wand_res: dict[str, list] = {}
    for name, q in [
        ("common", "id1x1 id2x2"),
        ("rare_or", "id19000x85 | id18500x70"),
        ("mixed_not", "id1x1 -id17000x25"),
    ]:
        a, ta = timed(lambda: [
            (r.doc_id, round(r.score, 9))
            for r in Q.bm25_topk_df(idx, q, k=20).collect()
        ])
        b, tb = timed(lambda: [
            (r.doc_id, round(r.score, 9))
            for r in Q.bm25_topk_sharded(idx, q, k=20).collect()
        ])
        wand_res[name] = b
        rank_ok = rank_ok and a == b
        # rank identity over an EMPTY result set is vacuous — the r5
        # probe originally queried id19000x76/id18500x62/id17000x69,
        # which don't exist (tokens are id{r}x{r % 97}), so assert the
        # probe terms actually hit the corpus
        assert len(a) > 0, f"probe query {name!r} matched nothing: {q}"
        q_times[name] = {
            "df_sec": round(ta, 2), "wand_sec": round(tb, 2),
            "n_hits": len(a),
        }
    res["rank_identical"] = rank_ok
    res["queries"] = q_times

    # --- prefix cap binds at this vocab ----------------------------------
    n_match = idx.terms.filter(F.col("term").startswith("id1")).count()
    a = [(r.doc_id, round(r.score, 9))
         for r in Q.bm25_topk_df(idx, "id1*", k=20).collect()]
    b = [(r.doc_id, round(r.score, 9))
         for r in Q.bm25_topk_sharded(idx, "id1*", k=20).collect()]
    res["prefix_vocab_matches"] = int(n_match)
    res["prefix_cap_binds"] = bool(n_match > 128)
    res["prefix_rank_identical"] = a == b
    res["rank_identical"] = res["rank_identical"] and a == b

    # --- serving tier at probe scale --------------------------------------
    # The 100 TB deployment story: Spark owns build + publish, replicas
    # open the published snapshot WITHOUT Spark and answer at interactive
    # latency.  Measure the pieces at this corpus size: publish wall,
    # artifact bytes, full-snapshot load, a 1/16-slice replica load, warm
    # query latency — and assert the serving tier is rank-identical to
    # the sharded WAND tier (full) / score-identical with GLOBAL
    # statistics (replica slice).
    import shutil
    import tempfile

    from limetrans_spark.operators.serve import LocalSearcher
    from limetrans_spark.plans import lifecycle as lc

    serve_root = tempfile.mkdtemp(prefix="scale_probe_snap_")
    try:
        snap, t_snap = timed(
            lambda: lc.save_index(idx, serve_root, "probe", "g1")
        )
        sizes = {}
        for sub in ("shards", "terms", "shard_dl", "docstore", "postings"):
            p = os.path.join(snap, sub)
            sizes[sub] = round(sum(
                os.path.getsize(os.path.join(dp, fn))
                for dp, _, fns in os.walk(p) for fn in fns
            ) / 2**20, 1)
        res["snapshot_sec"] = round(t_snap, 2)
        res["snapshot_mb"] = sizes
        # what a QUERY replica actually reads (docstore/postings serve
        # fetch-by-id and delta compaction, not search)
        search_mb = sizes["shards"] + sizes["terms"] + sizes["shard_dl"]
        res["snapshot_search_bytes_per_doc"] = round(
            search_mb * 2**20 / n_docs, 1
        )
        log(f"snapshot {t_snap:.1f}s search-artifacts {search_mb:.0f}MB")

        srv, t_load = timed(lambda: LocalSearcher.from_snapshot(snap))
        res["serve_load_full_sec"] = round(t_load, 2)
        n_shards = (n_docs - 1) // idx.shard_size + 1
        subset = [s for s in range(n_shards) if s % 16 == 0]
        replica, t_rep = timed(
            lambda: LocalSearcher.from_snapshot(snap, shard_subset=subset)
        )
        res["serve_load_replica_sec"] = round(t_rep, 2)
        res["replica_shards"] = f"{len(subset)}/{n_shards}"
        log(f"serve load full {t_load:.1f}s replica {t_rep:.1f}s")

        # rank identity vs the WAND tier on the same probe queries
        serve_ok = True
        for name, q in [
            ("common", "id1x1 id2x2"),
            ("rare_or", "id19000x85 | id18500x70"),
            ("mixed_not", "id1x1 -id17000x25"),
        ]:
            got = [(d, round(s, 9)) for d, s in srv.search(q, k=20)]
            serve_ok = serve_ok and got == wand_res[name]
        res["serve_rank_identical"] = serve_ok

        # warm latency (best-of: 20 reps after a warming call)
        serve_ms = {}
        for name, q in [
            ("and", "id1x1 id2x2"),
            ("or", "id19000x85 | id18500x70"),
            ("phrase", '"applicable law"'),
        ]:
            srv.search(q, k=10)
            t0 = time.time()
            for _ in range(20):
                srv.search(q, k=10)
            serve_ms[name] = round((time.time() - t0) / 20 * 1000, 2)
        res["serve_warm_ms"] = serve_ms
        log(f"serve warm {serve_ms}")

        # replica slice: same scores as the full searcher (global stats),
        # docs confined to its shards — the property that makes
        # cross-replica top-k merges exact
        full_scores = dict(srv.search("id1x1 id2x2", k=5000))
        got = replica.search("id1x1 id2x2", k=300)
        on_slice = all(d // idx.shard_size in set(subset) for d, _ in got)
        overlap = [(d, s) for d, s in got if d in full_scores]
        scores_eq = all(
            abs(s - full_scores[d]) < 1e-9 for d, s in overlap
        )
        res["replica_consistent"] = bool(
            got and on_slice and overlap and scores_eq
        )

        # replica fan-out: two complementary replicas (even/odd shards)
        # merged with merge_topk must reproduce the full searcher's
        # top-k EXACTLY (ids, scores, tie-breaks) — the sharded-serving
        # deployment shape at 100 TB
        from limetrans_spark.operators.serve import merge_topk

        halves = [
            LocalSearcher.from_snapshot(
                snap,
                shard_subset=[s for s in range(n_shards) if s % 2 == r],
            )
            for r in (0, 1)
        ]
        fan_ok = True
        for name, q in [
            ("common", "id1x1 id2x2"),
            ("rare_or", "id19000x85 | id18500x70"),
            ("mixed_not", "id1x1 -id17000x25"),
        ]:
            want = [(d, round(s, 9)) for d, s in srv.search(q, k=20)]
            got = [
                (d, round(s, 9))
                for d, s in merge_topk([h.search(q, k=20) for h in halves], 20)
            ]
            fan_ok = fan_ok and got == want
        res["fanout_merge_exact"] = bool(fan_ok)
    finally:
        shutil.rmtree(serve_root, ignore_errors=True)

    # --- dedup ground truth ----------------------------------------------
    exact, t_exact = timed(
        lambda: dedup.exact_dedup(docs, id_col="doc_id", text_col="text")
        .filter(F.col("is_dup") == 1).count()
    )
    res["exact_dedup_sec"] = round(t_exact, 2)
    res["exact_dups_found"] = int(exact)
    log(f"exact {t_exact:.1f}s dups={exact}")
    res["exact_dups_plausible"] = bool(
        0.02 * n_docs < exact < 0.10 * n_docs
    )

    if index_only:
        probes.append(noise_probe())
        res["noise_probe_sec"] = [round(p, 4) for p in probes]
        res["ok"] = bool(
            res["rank_identical"]
            and res["prefix_cap_binds"]
            and res["prefix_rank_identical"]
            and res["exact_dups_plausible"]
            and res["serve_rank_identical"]
            and res["replica_consistent"]
            and res["fanout_merge_exact"]
        )
        print(json.dumps(res))
        return 0 if res["ok"] else 1

    # --- MinHash-LSH recall on true dups + cluster resolution ------------
    # 3-gram shingles: the production near-dup feature (unigram sets on
    # a Zipf vocabulary share their head tokens, which makes every doc
    # pair a MinHash candidate — shingles keep candidates ≈ true dups)
    pairs, t_mh = timed(
        lambda: dedup.minhash_lsh_candidates(
            docs, num_hashes=16, bands=8, id_col="doc_id", text_col="text",
            ngram=3,
        ).persist()
    )
    n_pairs = pairs.count()
    res["minhash_sec"] = round(t_mh, 2)
    res["minhash_pairs"] = int(n_pairs)
    log(f"minhash {t_mh:.1f}s pairs={n_pairs}")
    # identical texts agree on every band → all exact-dup pairs are
    # candidates; spot-check via hash-join count
    texts = docs.select("doc_id", F.sha2("text", 256).alias("h"))
    dup_pairs = (
        texts.alias("a").join(texts.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    missed = dup_pairs.join(pairs, ["id_a", "id_b"], "left_anti").count()
    res["minhash_missed_true_dups"] = int(missed)

    clusters, t_cc = timed(
        lambda: dedup.near_dup_clusters(pairs, docs.select("doc_id"))
    )
    got, t_collect = timed(
        lambda: {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    )
    res["clusters_sec"] = round(t_cc + t_collect, 2)
    log(f"clusters {t_cc:.1f}s")
    edge_list = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    parent = list(range(n_docs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_, b_ in edge_list:
        ra, rb = find(a_), find(b_)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    res["clusters_match_union_find"] = bool(
        got == {i: find(i) for i in range(n_docs)}
    )

    probes.append(noise_probe())
    res["noise_probe_sec"] = [round(p, 4) for p in probes]
    res["ok"] = bool(
        res["rank_identical"]
        and res["prefix_cap_binds"]
        and res["prefix_rank_identical"]
        and res["exact_dups_plausible"]
        and res["serve_rank_identical"]
        and res["replica_consistent"]
        and res["fanout_merge_exact"]
        and res["minhash_missed_true_dups"] == 0
        and res["clusters_match_union_find"]
    )
    print(json.dumps(res))
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--index-only"]
    sys.exit(main(
        int(args[0]) if args else 100_000,
        index_only="--index-only" in sys.argv[1:],
    ))
