"""Deduplication operators for large-scale corpus curation.

The reference's only dedup is per-record field dedup
(``main/src/main/java/hbz/limetrans/function/Dedup.java``); a training-
data pipeline needs *cross-document* dedup.  All operators here are
shuffle-conscious:

* exact        — one hash-groupBy; canonical id = min doc id per hash.
* token-set Jaccard — similarity self-join via an inverted index on
  tokens (join on shared token, count intersections), never an O(n²)
  cross join.
* MinHash + LSH — portable signatures (lexicographic min of
  ``md5(salt‖token)``, reproducible in any engine), banded into buckets;
  candidate pairs only form inside a bucket.  At 100 TB the band-bucket
  groupBy is the only shuffle and the bucket key is uniform by
  construction (hash values), so no skew.
* SimHash      — 16-bit parity fingerprint from md5 nibbles; near-dup
  candidates share the fingerprint (or a band of it).
* embedding    — cosine near-dup over `array<float>` (see operators/ann).

Every operator is expressible in portable SQL (md5 + group-bys), which
is what the DuckDB oracle gate checks.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import simple_tokens

_LOG = logging.getLogger(__name__)

# df-ceiling victims above this count switch from a driver-side collect
# to the Spark-side semi-join fallback (see jaccard_pairs); module-level
# so tests can exercise the fallback without a 10^6-term corpus
_PRUNED_COLLECT_CAP = 1_000_000


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, content_hash, canonical_id, is_dup). Hash-groupBy; one shuffle."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    canon = h.groupBy("content_hash").agg(F.min(id_col).alias("canonical_id"))
    return (
        h.join(canon, "content_hash")
        .withColumn("is_dup", (F.col(id_col) != F.col("canonical_id")).cast("int"))
        .select(id_col, "content_hash", "canonical_id", "is_dup")
    )


def _feature_arrays(df: DataFrame, text_col: str, id_col: str, ngram: int = 1) -> DataFrame:
    """(id, tk) rows where ``tk`` is the DISTINCT feature set of the
    document — single tokens, or space-joined word shingles when
    ``ngram > 1`` (order-sensitive, much sharper near-dup signal on
    boilerplate-heavy corpora).

    Plan details that dominate wall time: (1) the token ARRAY is staged
    in its own projection, so the shingle transform references a
    materialized column instead of re-splitting the text inside every
    subexpression (CollapseProject keeps non-cheap, multiply-referenced
    aliases staged); (2) a small input (one parquet file → one scan
    split) is spread before tokenizing — at corpus scale the scan
    already yields ≫ defaultParallelism splits and the branch never
    fires, so no extra shuffle of raw text is added; (3) shingle i =
    tk[i] ‖ ' ' ‖ … ‖ tk[i+ngram−1] is built as ngram−1 element-wise
    zip_with concats over shifted slices — O(n) array work per row (the
    previous transform-over-sequence form allocated a fresh ngram-array
    + ran array_join per position, ~2× the stage cost at sf1.0; guide
    §1.2 "per-task work").  Identical strings out: concat_ws(' ', x, y)
    on non-null tokens ≡ array_join(…, ' ')."""
    staged = df.select(
        F.col(id_col).alias("id"), simple_tokens(F.col(text_col)).alias("tk")
    )
    sc = df.sparkSession.sparkContext
    spread = min(sc.defaultParallelism, 16)
    if df.rdd.getNumPartitions() * 2 <= spread:
        staged = staged.repartition(spread)
    if ngram > 1:
        m = F.greatest(F.size("tk") - (ngram - 1), F.lit(0))
        acc = F.slice(F.col("tk"), 1, m)
        for kk in range(1, ngram):
            acc = F.zip_with(
                acc,
                F.slice(F.col("tk"), kk + 1, m),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        feats = F.when(F.size("tk") >= ngram, acc).otherwise(
            F.array().cast("array<string>")
        )
    else:
        feats = F.col("tk")
    return staged.select("id", F.array_distinct(feats).alias("tk"))


def _token_sets(df: DataFrame, text_col: str, id_col: str, ngram: int = 1) -> DataFrame:
    """(id, term) distinct feature rows — the exploded face of
    :func:`_feature_arrays` (used by MinHash/SimHash and the prefix-
    filter Jaccard path)."""
    return _feature_arrays(df, text_col, id_col, ngram).select(
        "id", F.explode("tk").alias("term")
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_df: int | str | None = "auto",
    ngram: int = 1,
    prefix_filter: bool = False,
) -> DataFrame:
    """Token-set Jaccard similarity join → (id_a, id_b, jaccard ≥ threshold).
    ``ngram > 1`` computes Jaccard over word shingles instead of tokens.

    Inverted-index plan: explode distinct tokens, self-join on token
    (so only documents sharing ≥1 token ever pair), count shared tokens,
    then |A∪B| = |A|+|B|−|A∩B|.  All shuffles key on token or id pair.

    ``max_token_df`` is the high-DF ceiling that makes the plan survive
    skew: a token appearing in d documents contributes d² join rows, so
    one ubiquitous token (license boilerplate, a common keyword) turns
    the token join quadratic in the corpus.  Tokens with df >
    ``max_token_df`` are dropped from BOTH the join and the set sizes
    (Jaccard over the pruned token sets — the standard stop-token
    semantics); when auto-pruning fires it is logged at WARNING, never
    silent.  The default ``"auto"`` applies ``max(16, n_docs // 20)`` in
    EVERY mode — at 100 TB a caller who forgets the ceiling must not get
    the quadratic hot-token join by default; ``None`` opts into exact
    Jaccard explicitly.

    ``prefix_filter=True`` switches candidate generation to the SSJoin/
    PPJoin prefix filter: under a global rarest-first token order
    (ascending df, then term), two sets with Jaccard ≥ t must share a
    token within their first ``|d| − ⌊t·|d|⌋ + 1`` tokens, so only the
    prefixes join; survivors are verified with exact intersection
    counts.  Results are IDENTICAL to the exact plan (tested + gated);
    the join shrinks by ~(1−t)² — the decisive candidate-generation cut
    at high thresholds on 100 TB corpora.  (⌊·⌋ rather than ⌈·⌉ keeps
    the prefix a token longer, absorbing float boundary effects — a
    strict superset of the canonical candidates.)

    The result is materialized and cached before return (the caller owns
    that cache — ``.unpersist()`` when done); every intermediate cache is
    released here.
    """
    auto = max_token_df == "auto"
    if auto:
        max_token_df = max(16, df.count() // 20)
    if prefix_filter:
        toks_all = _token_sets(df, text_col, id_col, ngram).persist()
        toks = toks_all
        if max_token_df is not None:
            dfreq = toks_all.groupBy("term").agg(F.count("*").alias("df"))
            keep = dfreq.filter(F.col("df") <= max_token_df).select("term")
            n_pruned = dfreq.filter(F.col("df") > max_token_df).count()
            _log_prune(auto, n_pruned, max_token_df)
            if n_pruned:  # no victims → skip the semi-join stage entirely
                toks = toks_all.join(keep, "term", "left_semi")
        sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
        out = _jaccard_prefix_filtered(toks, sizes, float(threshold))
        out = out.persist()
        out.count()
        toks_all.unpersist()
        return out
    # blocked-grid path: per-doc feature ARRAYS (one row per document)
    # are the only relation that moves — ~50× fewer rows than the
    # exploded token table, no JVM explode, no dictionary join
    feats = _feature_arrays(df, text_col, id_col, ngram).persist()
    pruned_terms: list[str] = []
    dfreq = feats.select(F.explode("tk").alias("term")).groupBy("term").agg(
        F.count("*").alias("df")
    )
    dfd = F.col("df").cast("double")
    if max_token_df is not None:
        # ONE aggregate job yields both the pruning verdict and the
        # post-pruning pair-work estimate Σdf² (double: sizing only);
        # the victim terms themselves are collected only when any exist
        stats = dfreq.agg(
            F.sum(F.when(F.col("df") <= max_token_df, dfd * dfd)).alias("ss"),
            F.count(F.when(F.col("df") > max_token_df, 1)).alias("np"),
        ).first()
        pair_work = float(stats["ss"] or 0.0)
        n_pruned = int(stats["np"])
        _log_prune(auto, n_pruned, max_token_df)
        if 0 < n_pruned <= _PRUNED_COLLECT_CAP:
            pruned_terms = [
                r["term"]
                for r in dfreq.filter(F.col("df") > max_token_df)
                .select("term")
                .collect()
            ]
        elif n_pruned:
            # a caller-supplied pathologically low ceiling can prune
            # most of the vocabulary — fall back to a Spark-side
            # semi-join + re-collect of the pruned feature arrays
            kept = dfreq.filter(F.col("df") <= max_token_df).select("term")
            refeats = (
                feats.select("id", F.explode("tk").alias("term"))
                .join(kept, "term", "left_semi")
                .groupBy("id")
                .agg(F.collect_list("term").alias("tk"))
                .persist()
            )
            out = _pairs_blocked(refeats, [], float(threshold), pair_work=pair_work)
            out = out.persist()
            out.count()
            refeats.unpersist()
            feats.unpersist()
            return out
    else:
        pair_work = float(
            dfreq.agg(F.sum(dfd * dfd).alias("ss")).first()["ss"] or 0.0
        )
    out = _pairs_blocked(feats, pruned_terms, float(threshold), pair_work=pair_work)
    # materialize the (small) pair set while the feature cache is hot,
    # then release the corpus-sized intermediate — a long-lived session
    # must not accumulate storage blocks per dedup call
    out = out.persist()
    out.count()
    feats.unpersist()
    return out


def _log_prune(auto: bool, n_pruned: int, max_token_df) -> None:
    if auto and n_pruned:
        _LOG.warning(
            "jaccard_pairs: auto df-ceiling pruned %d tokens with df > %d "
            "(Jaccard is over the pruned sets; pass max_token_df=None for "
            "exact Jaccard)",
            n_pruned,
            max_token_df,
        )
    else:
        _LOG.info(
            "jaccard_pairs: pruned %d tokens with df > %d", n_pruned, max_token_df
        )


def _grid_block_count(par: int, env_b: str | None, pair_work: float | None) -> int:
    """Pure sizing arithmetic for the blocked all-pairs grid (tested in
    isolation).  ``LIMETRANS_JACCARD_BLOCKS`` wins outright; otherwise
    B grows as √parallelism (floor 8) and additionally floors at
    √(2·Σdf²/2²⁵) — the per-cell pair count is ≈ 2·Σdf²/B², so that
    floor caps every cell's key buffer at ~256 MB no matter the corpus
    size — capped at 256 to bound the replication factor."""
    import math

    if env_b:
        return max(2, int(env_b))
    n_blocks = max(8, int(math.ceil(2.0 * math.sqrt(par))))
    if pair_work:
        n_blocks = max(
            n_blocks,
            min(
                256,
                int(math.ceil(math.sqrt(2.0 * pair_work / float(1 << 25)))),
            ),
        )
    return n_blocks


def _pairs_blocked(
    feats: DataFrame,
    pruned_terms: list[str],
    threshold: float,
    n_blocks: int | None = None,
    pair_work: float | None = None,
) -> DataFrame:
    """Exact Jaccard pair counting via a blocked all-pairs grid
    (1-bucket theta-join partitioning, Okcan & Riedewald SIGMOD'11 —
    public-literature pattern), replacing the token self-join +
    corpus-wide pair aggregation.

    Motivation (guide §2.3/§2.4, measured round 6 at sf1.0): the
    inverted-index self-join on ``term`` emits Σ_t C(df_t, 2) pair rows
    (127 M for 2.6 M shingle rows under the n/20 df-ceiling) that all
    cross an Exchange into the pair aggregation, for 2 546 final rows —
    a ~50 000× shuffle amplification.  Here the only wide movement is
    the per-document feature-ARRAY relation (one row per doc — §2.3
    "shuffle keys and metadata instead of payloads" inverted: ship the
    compact form, never the exploded form):

    * ids are hashed into ``B = n_blocks`` deterministic blocks
      (``pmod(xxhash64(id), B)`` — guide §2.5: never rand-derived);
    * a pair (a, b) with blocks (p, q) is counted in exactly one grid
      cell ``(min(p,q), max(p,q))``; each doc row is replicated to the
      B cells its block participates in;
    * cells travel through a plain ``repartition(…, cell)`` +
      ``mapInArrow`` — NOT ``applyInPandas``, whose exec sorts every
      partition by the group key JVM-side and converts per group to
      pandas (measured +8 s at sf1.0);
    * in Python the feature strings are dictionary-encoded ONCE per
      partition by pyarrow (C-speed), df-ceiling victims (a driver-side
      list bounded by Σdf/ceiling — the hot terms themselves) are
      dropped by dictionary slot, and per-cell intersection counts are
      computed in NumPy: per-term posting-list outer products packed
      into one int64 key buffer, one in-place sort, run-length
      boundaries.  The Jaccard filter runs LOCALLY, so only near-final
      survivor rows leave Python; no pair row is ever shuffled.  Set
      sizes are not joined on — a cell holds every member doc's full
      (pruned) feature set, so ``sz`` is a local element count.

    Bit-equivalence with the old plan: ``inter`` is an exact integer
    count; ``jaccard = inter/(sz_a+sz_b−inter)`` is a single IEEE-754
    double division evaluated identically in NumPy and Catalyst, and
    the ``>= threshold`` filter applies to the UNROUNDED quotient in
    both plans (the old plan rounded only in the output projection, so
    the local filter admits exactly the same pairs).  ``round(…, 6)``
    (HALF_UP) stays in Catalyst.

    Scale behaviour: per-cell input is ~2/B of the corpus, so ``B``
    (default ``max(8, ceil(2·sqrt(defaultParallelism)))``, env override
    ``LIMETRANS_JACCARD_BLOCKS``) grows with the cluster and per-cell
    memory SHRINKS as 1/B while replication grows linearly — the
    standard grid trade.  The per-cell pair buffer is Σ df_i·df_j over
    the cell, which the df-ceiling bounds exactly as it bounded the old
    join's row count.
    """
    import os as _os

    import numpy as np

    spark = feats.sparkSession
    if n_blocks is None:
        # measured at sf1.0/32 cores: B=12 beats B=8 ~3× (smaller
        # per-cell buffers stay inside the workers' warm heap and the
        # ~B²/2 cells hash-balance far better over the tasks)
        n_blocks = _grid_block_count(
            spark.sparkContext.defaultParallelism,
            _os.environ.get("LIMETRANS_JACCARD_BLOCKS"),
            pair_work,
        )
    B = int(n_blocks)
    thr = float(threshold)
    n_cells = B * (B + 1) // 2
    n_parts = max(n_cells, spark.sparkContext.defaultParallelism * 2)
    pruned = list(pruned_terms)

    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(B)).cast("int")
    cells = (
        feats.withColumn("blk", blk)
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(B - 1)),
                    lambda k: F.least(F.col("blk"), k) * B
                    + F.greatest(F.col("blk"), k),
                )
            ),
        )
        .select("cell", "blk", "id", "tk")
    )

    def _one_cell(bi, bj, ids, tid, blks, out):
        """Count intersections for one cell whose rows are tid-sorted."""
        diagonal = bi == bj
        if diagonal:
            ac, aid_ = tid, ids
            bc, bid_ = ac, aid_
        else:
            m = blks == bi
            ac, aid_ = tid[m], ids[m]
            m = blks == bj
            bc, bid_ = tid[m], ids[m]
        if ac.size == 0 or bc.size == 0:
            return
        ua, ia, ca = np.unique(ac, return_index=True, return_counts=True)
        ub, ib, cb = np.unique(bc, return_index=True, return_counts=True)
        common, xa, xb = np.intersect1d(
            ua, ub, assume_unique=True, return_indices=True
        )
        if common.size == 0:
            return
        na, nb_ = ca[xa].astype(np.int64), cb[xb].astype(np.int64)
        sa, sb = ia[xa], ib[xb]

        # fully-vectorized grouped cartesian product — O(T) np.repeat /
        # gather calls, NO per-term Python loop (measured 130 µs/term of
        # pure loop overhead on 13×12 slices vs 0.3 s total for 4 M
        # pairs vectorized):
        #   id_a: each A-side element of group g repeated nb_g times
        #   id_b: group g's B-side slice tiled na_g times
        # Generation runs over SLICES of term groups (Σ na·nb ≤ 2²⁵ per
        # slice) writing packed keys into one preallocated buffer, so
        # transient arrays stay bounded no matter how large a cell's
        # pair count grows at bigger scale factors; one in-place sort of
        # the buffer then counts every pair exactly once across slices.
        def _ranges(starts, counts):
            total = int(counts.sum())
            cum_ex = np.concatenate(([0], np.cumsum(counts)[:-1]))
            return np.repeat(starts - cum_ex, counts) + np.arange(
                total, dtype=np.int64
            )

        lo32 = ids.min() >= 0 and ids.max() < (1 << 31)
        tot = na * nb_
        t_ub = int(tot.sum())
        slice_cap = 1 << 25
        bounds = [0]
        acc = 0
        for g, tg in enumerate(tot):
            acc += int(tg)
            if acc >= slice_cap:
                bounds.append(g + 1)
                acc = 0
        if bounds[-1] != len(tot):
            bounds.append(len(tot))

        def gen_slice(s_g, e_g):
            na_s, nb_s = na[s_g:e_g], nb_[s_g:e_g]
            idx_a = _ranges(sa[s_g:e_g], na_s)
            id_a = np.repeat(aid_[idx_a], np.repeat(nb_s, na_s))
            copy_grp = np.repeat(np.arange(e_g - s_g), na_s)
            id_b = bid_[_ranges(sb[s_g:e_g][copy_grp], nb_s[copy_grp])]
            if diagonal:
                msk = id_a < id_b
                id_a, id_b = id_a[msk], id_b[msk]
            return id_a, id_b

        if lo32:
            # pack (a-side id, b-side id) into one int64: within a cell
            # a pair always packs the same way, so run-length counting
            # on the sorted buffer is an exact intersection count
            buf = np.empty(t_ub, dtype=np.int64)
            pos = 0
            for s_g, e_g in zip(bounds[:-1], bounds[1:]):
                id_a, id_b = gen_slice(s_g, e_g)
                buf[pos : pos + id_a.size] = (id_a << 32) | id_b
                pos += id_a.size
            keys = buf[:pos]
            if keys.size == 0:
                return
            keys.sort()
            bnd = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], bnd))
            uk = keys[starts]
            inter = np.diff(np.concatenate((starts, [keys.size])))
            a_u = uk >> 32
            b_u = uk & np.int64(0xFFFFFFFF)
        else:
            # generic-id fallback: 2-column lexsort instead of packing
            buf_a = np.empty(t_ub, dtype=np.int64)
            buf_b = np.empty(t_ub, dtype=np.int64)
            pos = 0
            for s_g, e_g in zip(bounds[:-1], bounds[1:]):
                id_a, id_b = gen_slice(s_g, e_g)
                buf_a[pos : pos + id_a.size] = id_a
                buf_b[pos : pos + id_b.size] = id_b
                pos += id_a.size
            if pos == 0:
                return
            o = np.lexsort((buf_b[:pos], buf_a[:pos]))
            ba, bb = buf_a[:pos][o], buf_b[:pos][o]
            bnd = (
                np.flatnonzero((ba[1:] != ba[:-1]) | (bb[1:] != bb[:-1]))
                + 1
            )
            starts = np.concatenate(([0], bnd))
            a_u, b_u = ba[starts], bb[starts]
            inter = np.diff(np.concatenate((starts, [ba.size])))
        lo_u = np.minimum(a_u, b_u)
        hi_u = np.maximum(a_u, b_u)
        # set sizes: every member id's full pruned set is in the cell
        uid, sz_u = np.unique(ids, return_counts=True)
        sz_a = sz_u[np.searchsorted(uid, lo_u)]
        sz_b = sz_u[np.searchsorted(uid, hi_u)]
        jac = inter.astype(np.float64) / (sz_a + sz_b - inter).astype(
            np.float64
        )
        keep_m = jac >= thr
        if keep_m.any():
            out.append((lo_u[keep_m], hi_u[keep_m], jac[keep_m]))

    def count_cells(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)
        if tbl.num_rows == 0:
            return
        cell = tbl.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        blkc = tbl.column("blk").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        tk = tbl.column("tk")
        lens = (
            pc.list_value_length(tk)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(tk)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        di = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), lens)
        if pruned:
            bad = pc.is_in(
                enc.dictionary, value_set=pa.array(pruned, pa.string())
            ).to_numpy(zero_copy_only=False)
            keep_el = ~bad[codes]
            di, codes = di[keep_el], codes[keep_el]
        ecell = cell[di]
        eblk = blkc[di]
        eid = ids[di]
        order = np.lexsort((codes, ecell))
        ecell, eblk = ecell[order], eblk[order]
        eid, codes = eid[order], codes[order]
        bnd = np.flatnonzero(ecell[1:] != ecell[:-1]) + 1
        starts = np.concatenate(([0], bnd, [ecell.size]))
        out: list[tuple] = []
        for s, e in zip(starts[:-1], starts[1:]):
            if s == e:
                continue
            c = int(ecell[s])
            _one_cell(c // B, c % B, eid[s:e], codes[s:e], eblk[s:e], out)
        if not out:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.concatenate([x[0] for x in out]), pa.int64()),
                pa.array(np.concatenate([x[1] for x in out]), pa.int64()),
                pa.array(
                    np.concatenate([x[2] for x in out]), pa.float64()
                ),
            ],
            ["id_a", "id_b", "jaccard"],
        )

    survivors = cells.repartition(n_parts, "cell").mapInArrow(
        count_cells, "id_a long, id_b long, jaccard double"
    )
    return survivors.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _jaccard_prefix_filtered(toks: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """SSJoin/PPJoin candidate generation + exact verification.

    Theorem (prefix filtering): fix any total order on the token
    universe.  If ``|A∩B| ≥ α``, the first ``|A|−α+1`` tokens of A and
    the first ``|B|−α+1`` of B (in that order) intersect — otherwise all
    shared tokens would sit in the two suffixes of length α−1 < α.
    For Jaccard ≥ t, ``|A∩B| ≥ t·|A∪B| ≥ t·|A|`` (and ≥ t·|B|), so
    per-doc ``α = ⌊t·|d|⌋`` (floor: one token of slack, see caller) and
    only the prefixes need to self-join.  The order is ascending global
    df then term — rarest-first, so prefixes join on the LEAST frequent
    tokens, exactly inverting the hot-token blowup.

    Verification joins the candidate pairs back to the full token sets
    on ``(id, term)`` — equi-keys, no per-pair cartesian — and applies
    the exact Jaccard filter, so the output is identical to the exact
    plan.
    """
    from pyspark.sql import Window

    dfreq = toks.groupBy("term").agg(F.count("*").alias("tdf"))
    w = Window.partitionBy("id").orderBy(F.col("tdf").asc(), F.col("term").asc())
    ranked = (
        toks.join(dfreq, "term")
        .withColumn("rnk", F.row_number().over(w))
        .join(sizes, "id")
    )
    pref = ranked.filter(
        F.col("rnk")
        <= F.col("sz") - F.floor(F.lit(threshold) * F.col("sz").cast("double")) + 1
    ).select("id", "term", "sz")
    pa, pb = pref.alias("a"), pref.alias("b")
    cand = (
        pa.join(
            pb,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.least(F.col("a.sz"), F.col("b.sz")).cast("double")
                / F.greatest(F.col("a.sz"), F.col("b.sz")).cast("double")
                >= F.lit(threshold)
            ),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .distinct()
    )
    ta = toks.select(F.col("id").alias("id_a"), "term")
    tb = toks.select(F.col("id").alias("id_b"), "term")
    return (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "term"])  # (id_b, term) equi-join: only shared tokens survive
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """→ (id, h0..h{n-1}): lexicographic-min of md5(salt‖token) per salt.

    String-min MinHash is a valid permutation-min (md5 is the random
    permutation of the token universe) and — unlike xxhash — is
    bit-reproducible across Spark, DuckDB, and Python.
    """
    toks = _token_sets(df, text_col, id_col, ngram)
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("term")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return toks.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """MinHash-LSH candidate pairs → (id_a, id_b, n_bands_matched).
    ``ngram > 1`` minhashes word shingles (the classic shingle-LSH).

    ``num_hashes/bands`` rows per band; documents collide in a band iff
    that band's signature slice is identical.  The band groupBy key is a
    hash value → uniformly distributed → skew-free shuffle.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, text_col, id_col, ngram)
    per_band = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        per_band.append(
            sig.select(
                "id",
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("bucket"),
            )
        )
    banded = per_band[0]
    for p in per_band[1:]:
        banded = banded.unionByName(p)
    a = banded.alias("a")
    b_ = banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands_matched"))
    )


def simhash(
    df: DataFrame,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id, simhash): ``bits``-bit SimHash over distinct tokens.

    Bit j = sign of Σ_tokens (parity of md5 hex digit j) — parity read
    straight off the md5 nibble, so the fingerprint is engine-portable.
    Emitted as a bit-string column (msb = bit 0) for grouping/banding.
    """
    assert bits <= 32
    toks = _token_sets(df, text_col, id_col)
    toks = toks.withColumn("h", F.md5(F.col("term")))
    votes = [
        F.sum(
            F.when(
                F.substring("h", j + 1, 1).isin("1", "3", "5", "7", "9", "b", "d", "f"),
                1,
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("id").agg(*votes)
    bit_cols = [
        F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits)
    ]
    return agg.select("id", F.concat(*bit_cols).alias("simhash"))


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine near-dup pairs over an embedding column (float64 math).

    Brute-force O(n²) pairing — correct baseline; the scale path buckets
    by LSH/IVF first (operators/ann.py) so only same-bucket pairs join.
    """
    from .ann import cosine_expr

    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def random_hyperplanes(n_planes: int, dim: int, seed: int = 20260816) -> list[list[float]]:
    """Deterministic random-hyperplane set for sign-LSH, components
    rounded to 8 decimals so the SAME literals embed into the Spark plan
    and any SQL oracle (decimal→double parsing is IEEE-identical)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    return [[round(float(x), 8) for x in p] for p in planes]


def embedding_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 20260816,
) -> DataFrame:
    """Scale path for embedding near-dup: sign-LSH bucketed candidate
    generation → exact cosine only inside buckets.

    Signature bit i = [dot(v, hᵢ) ≥ 0] for ``n_planes`` fixed random
    hyperplanes (collision probability 1 − θ/π per bit — the SimHash
    bound); bits split into ``bands``, candidates = id pairs sharing any
    band's full bit-slice.  The band bucket key is a hash-like bit
    pattern → uniform groupBy, no skew; no cross join anywhere, unlike
    :func:`embedding_near_dup_pairs` (the exact oracle baseline).
    Deterministic given ``seed``; recall < 1 by construction — raise
    ``n_planes``/lower ``bands`` for tighter thresholds.

    The result is materialized and cached before return (the caller owns
    that cache — ``.unpersist()`` when done); the signature cache is
    released here.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    assert n_planes % bands == 0
    rows_per_band = n_planes // bands
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    dim = len(first[0])
    planes = np.asarray(random_hyperplanes(n_planes, dim, seed), dtype=np.float64)

    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )

    # one Arrow-batched matmul per batch: n_planes Catalyst fold
    # expressions would blow past the codegen limits and fall back to
    # interpreted evaluation — the matmul is both faster and simpler
    @pandas_udf(T.StringType())
    def sig_udf(vecs):
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        bits = (m @ planes.T) >= 0.0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    sig = v.select("id", "v", sig_udf(F.col("v")).alias("sig"))
    # one pass: posexplode the per-band signature slices instead of a
    # bands-way union that would re-run the signature UDF per branch
    banded = sig.select(
        "id",
        "v",
        F.posexplode(
            F.array(
                *[
                    F.substring("sig", b * rows_per_band + 1, rows_per_band)
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )

    # Round 6 (guide §2.3/§3.3): the former plan joined every same-bucket
    # id pair (~3 M rows at 20 k vectors / 32 planes), deduped them with
    # a corpus-wide ``distinct``, then re-attached both vectors via two
    # shuffle joins and evaluated the cosine as an interpreted Catalyst
    # fold per pair.  Scoring now happens LOCALLY: vectors ride with
    # their band rows into one hash exchange, and a partition-level
    # ``mapInArrow`` kernel walks its (band, bucket) groups computing an
    # n×n accumulation per group (never a pairs×dim matrix, never a
    # per-group pandas conversion — 1024 tiny groups at 32 planes made
    # applyInPandas pay ~1 ms each).  A local unrounded pre-filter
    # (threshold − 1e-6 — a strict superset, since round(…, 6) can raise
    # a value by at most 5e-7) means only survivor rows leave Python;
    # ``round``/``filter``/``distinct`` stay in Catalyst, so a pair
    # colliding in several bands collapses to one row exactly as before.
    #
    # Bit-equivalence: the dim loop adds ``col·colᵀ`` / ``col²`` in
    # ascending j — every lane performs the same IEEE adds/muls in the
    # same order as Catalyst's zip_with/aggregate fold in
    # :func:`ann.cosine_expr`; then one multiply and one divide.  The
    # doubles handed back are exactly what the old plan rounded.
    thr = float(threshold)
    n_parts = df.sparkSession.sparkContext.defaultParallelism * 2

    def score_parts(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)
        nrow = tbl.num_rows
        if nrow < 2:
            return
        ids = tbl.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        band = tbl.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        benc = tbl.column("bucket").combine_chunks().dictionary_encode()
        bcode = benc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vcol = tbl.column("v").combine_chunks()
        lens = pc.list_value_length(vcol).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = int(lens[0])
        flat = pc.list_flatten(vcol).to_numpy(zero_copy_only=False)
        m = np.ascontiguousarray(flat.reshape(nrow, d))
        order = np.lexsort((ids, bcode, band))
        ids, band, bcode = ids[order], band[order], bcode[order]
        m = m[order]
        grp_bnd = (
            np.flatnonzero((band[1:] != band[:-1]) | (bcode[1:] != bcode[:-1]))
            + 1
        )
        g_starts = np.concatenate(([0], grp_bnd, [nrow]))
        out_a, out_b, out_c = [], [], []
        for s, e in zip(g_starts[:-1], g_starts[1:]):
            n = e - s
            if n < 2:
                continue
            msub = m[s:e]
            dot = np.zeros((n, n), dtype=np.float64)
            nsq = np.zeros(n, dtype=np.float64)
            for j in range(d):
                col = msub[:, j]
                dot += col[:, None] * col[None, :]
                nsq += col * col
            norm = np.sqrt(nsq)
            iu, ju = np.triu_indices(n, 1)
            cos = dot[iu, ju] / (norm[iu] * norm[ju])
            keep = cos >= thr - 1e-6
            if keep.any():
                out_a.append(ids[s:e][iu[keep]])
                out_b.append(ids[s:e][ju[keep]])
                out_c.append(cos[keep])
        if not out_a:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.concatenate(out_a), pa.int64()),
                pa.array(np.concatenate(out_b), pa.int64()),
                pa.array(np.concatenate(out_c), pa.float64()),
            ],
            ["id_a", "id_b", "cosine"],
        )

    out = (
        banded.repartition(n_parts, "band", "bucket")
        .mapInArrow(score_parts, "id_a long, id_b long, cosine double")
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
    out = out.persist()
    out.count()
    return out


def near_dup_clusters(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Resolve near-dup PAIRS into clusters → (doc_id, cluster_id), with
    ``cluster_id`` = the smallest doc id in the connected component —
    the survivor-selection step after :func:`jaccard_pairs` /
    :func:`minhash_lsh_candidates` / :func:`embedding_lsh_pairs`
    (keep ``doc_id == cluster_id``, drop the rest).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014 — the
    same algorithm GraphFrames ships).  Each half-round, every node u
    computes ``m = min(Γ(u) ∪ {u})`` (one shuffle: symmetrize + groupBy
    min) and rewires edges: large-star attaches u's strictly-larger
    neighbors to m, small-star attaches u itself and its ≤-neighbors to
    m.  The edge set never grows, the graph stays connected, and the
    alternation provably converges in O(log² n) rounds to stars
    centered at each component's minimum — in practice ~10 rounds for a
    10k-node graph mixing cliques, 2000-node chains, stars and random
    edges.  (The previous min-label-propagation + pointer-jump loop
    needed O(diameter) rounds on exactly such graphs: ``label[label]``
    only doubles reach when component ids ascend along the chain, which
    real pair graphs don't guarantee.)  Fixpoint = edge-set equality
    with the previous round, checked exactly via counts
    (|A|=|B| ∧ |A∪B|=|A| ⟺ A=B for distinct sets); ``max_iter`` raises
    rather than returning a half-resolved clustering.

    Deterministic at any parallelism (min is order-free).  Round
    hygiene — the cross-round edge table is written to ``scratch_dir``
    as parquet and re-read each round, NOT cached or checkpointed, for
    two reasons found the hard way:

    * lineage: each round references the previous edges several times;
      without truncation the analyzed plan grows geometrically and a
      ~30-round run OOMs the driver materializing the plan tree;
    * statistics: ``localCheckpoint`` truncates lineage but PRESERVES
      the plan's size-in-bytes stat (``LogicalRDD`` ``originStats``),
      and Catalyst's join-size estimate is the PRODUCT of child sizes —
      carried across rounds the leaf stat exponentiates (digit count
      ~6× per round) until planning burns minutes of driver CPU doing
      BigInteger Karatsuba multiplies inside
      ``SizeInBytesOnlyStatsPlanVisitor`` (observed: round 12 of a
      10k-node graph took 68 s, ~5× the round before).  A parquet
      round-trip makes the next round's leaf a plain file scan with
      HONEST statistics — the reliable-checkpoint pattern GraphFrames
      uses.

    ``scratch_dir`` defaults to a driver-local temp dir (right for
    local mode); on a real cluster pass a path on shared storage.  The
    round-trip is one narrow (a, b) edge table that shrinks toward
    n - #components rows, so its I/O is dwarfed by the round's own
    shuffles.  The result's blocks are materialized (caller owns them —
    same contract as the pair generators).
    """
    import shutil
    import tempfile

    spark = pairs.sparkSession
    own_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="near_dup_cc_")

    def star(e: DataFrame, large: bool) -> DataFrame:
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        joined = sym.join(mins, "u")
        if large:
            # attach strictly-larger neighbors to m: m ≤ u < v, so the
            # emitted pair is already (lo, hi) = (m, v) and never a loop
            return joined.where(F.col("v") > F.col("u")).select(
                F.col("m").alias("a"), F.col("v").alias("b")
            )
        # small-star: attach ≤-neighbors and u itself to m (m ≤ v ≤ u)
        return (
            joined.where((F.col("v") <= F.col("u")) & (F.col("v") != F.col("m")))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .unionByName(
                mins.where(F.col("u") != F.col("m")).select(
                    F.col("m").alias("a"), F.col("u").alias("b")
                )
            )
        )

    init_dir = f"{scratch}/round_init"
    (
        pairs.select(
            F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .write.mode("overwrite")
        .parquet(init_dir)
    )
    edges = spark.read.parquet(init_dir)
    prev_count = edges.count()
    converged = False
    prev_round_dir = init_dir
    for rnd in range(max_iter):
        round_dir = f"{scratch}/round_{rnd}"
        star(star(edges, large=True), large=False).distinct().write.mode(
            "overwrite"
        ).parquet(round_dir)
        new_edges = spark.read.parquet(round_dir)
        new_count = new_edges.count()
        # exact set equality for two distinct sets via counts
        same = new_count == prev_count and (
            new_edges.unionByName(edges).distinct().count() == new_count
        )
        if own_scratch:
            shutil.rmtree(prev_round_dir, ignore_errors=True)
        prev_round_dir = round_dir
        edges, prev_count = new_edges, new_count
        if same:
            converged = True
            break
    if not converged:
        if own_scratch:
            shutil.rmtree(scratch, ignore_errors=True)
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iter} rounds "
            "(pathological graph? raise max_iter)"
        )
    # final state is stars centered at each component's min: a leaf's
    # minimum neighbor IS the center; isolated ids label themselves
    nbrmin = (
        edges.select(F.col("a").alias("id"), F.col("b").alias("v"))
        .unionByName(edges.select(F.col("b").alias("id"), F.col("a").alias("v")))
        .groupBy("id")
        .agg(F.min("v").alias("nbrmin"))
    )
    out = (
        ids.select(F.col(id_col).alias("id"))
        .distinct()
        .join(nbrmin, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.least("id", F.coalesce("nbrmin", "id")).alias("cluster_id"),
        )
        # detach the result from the scratch files before cleanup
        .localCheckpoint(eager=True)
    )
    if own_scratch:
        shutil.rmtree(scratch, ignore_errors=True)
    return out
