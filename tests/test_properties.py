"""Property-based tests (hypothesis) for the pure kernels — the codec
and the analyzers are the layers where a single wrong byte silently
corrupts rankings, so they get generative coverage on top of the fixed
vectors."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from limetrans_spark.functions.analysis import (
    code_doc_length,
    code_tokenize_py,
    invert_py,
    simple_tokenize_py,
)
from limetrans_spark.operators import codec

sorted_unique_int64 = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=0, max_size=200, unique=True
).map(sorted)


@settings(max_examples=200, deadline=None)
@given(sorted_unique_int64)
def test_varint_delta_roundtrip(vals):
    a = np.asarray(vals, dtype=np.int64)
    blob = codec.varint_encode(codec.delta_encode(a, 0))
    back = codec.delta_decode(codec.varint_decode(blob, a.size), 0)
    assert back.tolist() == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(sorted_unique_int64, min_size=1, max_size=20))
def test_grouped_position_encoding_roundtrip(lists):
    lists = [l for l in lists if l]  # empty lists carry no payload
    if not lists:
        return
    flat = np.asarray([x for l in lists for x in l], dtype=np.int64)
    lens = np.asarray([len(l) for l in lists], dtype=np.int64)
    blobs = codec.encode_positions_grouped(flat, lens)
    assert len(blobs) == len(lists)
    decoded = codec.decode_positions(b"".join(blobs), lens)
    assert [d.tolist() for d in decoded] == lists


@settings(max_examples=100, deadline=None)
@given(sorted_unique_int64.filter(lambda v: len(v) > 0), st.integers(0, 2**20))
def test_postings_block_roundtrip(docs, base_off):
    d = np.asarray(docs, dtype=np.int64) + base_off
    t = np.arange(1, d.size + 1, dtype=np.int64)
    doc_blob, tf_blob, bl, bm = codec.encode_postings(d, t, base=base_off)
    dd, tt = codec.decode_postings(doc_blob, tf_blob, d.size, base=base_off)
    assert dd.tolist() == d.tolist() and tt.tolist() == t.tolist()
    # block-max metadata is sound: every block max bounds its members
    assert max(bm) == int(t.max())


text_strategy = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po", "Pd", "Pc"),
        max_codepoint=0x2FF,
    ),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_code_tokenizer_invariants(text):
    toks = code_tokenize_py(text)
    # positions are sorted, non-negative, dense-ish (dl = max+1)
    poss = [p for _, p in toks]
    assert poss == sorted(poss)
    assert all(p >= 0 for p in poss)
    assert code_doc_length(toks) == ((max(poss) + 1) if toks else 0)
    # terms are lowercase and token-charset only
    assert all(t == t.lower() and t for t, _ in toks)
    # determinism
    assert toks == code_tokenize_py(text)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_invert_py_consistent_with_tokenizer(text):
    dl, postings = invert_py(text, "code")
    toks = code_tokenize_py(text)
    assert dl == code_doc_length(toks)
    # tf sums to the token count; positions sorted per term
    assert sum(tf for _, tf, _ in postings) == len(toks)
    for term, tf, ps in postings:
        assert len(ps) == tf and ps == sorted(ps)
    # terms sorted (the SPIMI mapper's determinism contract)
    assert [t for t, _, _ in postings] == sorted(t for t, _, _ in postings)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_simple_tokenizer_matches_regex_semantics(text):
    toks = simple_tokenize_py(text)
    assert all(t and all(c.islower() or c.isdigit() for c in t) for t in toks)
    # idempotent under its own output
    assert simple_tokenize_py(" ".join(toks)) == toks


# --- sloppy-phrase DP vs brute force (round 4) ------------------------------

pos_list = st.lists(
    st.integers(min_value=0, max_value=30), min_size=1, max_size=8
).map(lambda xs: np.array(sorted(set(xs)), dtype=np.int64))


@settings(max_examples=300, deadline=None)
@given(
    st.lists(pos_list, min_size=2, max_size=4),
    st.integers(min_value=0, max_value=6),
)
def test_sloppy_match_dp_equals_bruteforce(pos_lists, slop):
    """The engine's prefix-max DP ≡ exhaustive DFS over all ordered
    occurrence selections (total extra gap ≤ slop), on random inputs."""
    from limetrans_spark.operators.query import _sloppy_match_np

    def brute(i, prev, used):
        if i == len(pos_lists):
            return True
        return any(
            p > prev and used + (p - prev - 1) <= slop and brute(i + 1, p, used + (p - prev - 1))
            for p in pos_lists[i].tolist()
        )

    want = any(brute(1, p, 0) for p in pos_lists[0].tolist())
    assert _sloppy_match_np(pos_lists, slop) == want


@settings(max_examples=300, deadline=None)
@given(
    st.lists(pos_list, min_size=2, max_size=4),
    st.integers(min_value=1, max_value=6),
)
def test_unordered_slop_vec_equals_bruteforce(pos_lists, slop):
    """The unordered-NEAR window sweep in ``_phrase_docs_vec`` ≡ exhaustive
    product over occurrence choices (adjusted-position span ≤ slop), and
    every ordered match is also an unordered match (the ordered gap sum
    telescopes into the span)."""
    import itertools

    from limetrans_spark.operators.query import _phrase_docs_vec, _sloppy_match_np

    cand = np.array([7], dtype=np.int64)
    per_term = [[pl] for pl in pos_lists]
    adj = [[int(p) - i for p in pl.tolist()] for i, pl in enumerate(pos_lists)]
    want = any(max(c) - min(c) <= slop for c in itertools.product(*adj))
    got = _phrase_docs_vec(cand, per_term, slop, in_order=False).size > 0
    assert got == want
    if _sloppy_match_np(pos_lists, slop):
        assert got  # ordered ⊆ unordered at equal slop


# --- nested path ops invariants (round 4) -----------------------------------

_key = st.sampled_from(["a", "b", "c", "d"])
_scalar = st.text(alphabet="xyz01", max_size=4)


def _tree(depth):
    if depth == 0:
        return _scalar
    return st.dictionaries(
        _key,
        st.one_of(_scalar, st.lists(_scalar, max_size=3), _tree(depth - 1)),
        max_size=4,
    )


@settings(max_examples=200, deadline=None)
@given(_tree(2), st.lists(_key, min_size=1, max_size=3), _scalar)
def test_path_set_then_get_roundtrip(rec, segs, value):
    """After path_set(p, v) on plain-name paths, path_get(p) sees v; a
    following path_remove(p) erases every match and is idempotent."""
    from limetrans_spark.functions.records import path_get, path_remove, path_set

    path = ".".join(segs)
    try:
        path_set(rec, path, value)
    except ValueError:
        return  # hit a scalar/list intermediate — documented behavior
    assert value in path_get(rec, path)
    path_remove(rec, path)
    assert path_get(rec, path) == []
    path_remove(rec, path)  # idempotent on missing paths


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyzäöüß", min_size=0, max_size=24))
def test_german2_stem_invariants(word):
    """German2 over its full input alphabet: output is ascii lowercase
    (the postlude strips every umlaut the prelude introduces and
    unmarks U/Y) — EXCEPT that 'ß' may survive when it falls in the
    shadow of a 'qu' near the string end: in the published source the
    ß→ss rule shares the prelude ``among`` with ``'qu' (hop 2)``, and
    when fewer than two characters follow the qu the among fails and
    ``repeat`` terminates with the tail unreplaced ('quß' stays 'quß';
    hypothesis found this corner, and the implementation matches the
    spec rather than the looser invariant this test first claimed).
    Output is never longer than the ß-expanded input, and the stem of
    a stem never crashes."""
    from limetrans_spark.functions.stem_de import german2_stem

    out = german2_stem(word)
    assert all("a" <= c <= "z" or c == "ß" for c in out), (word, out)
    if "ß" in out:
        assert "qu" in word.lower(), (word, out)  # only the hop shadow
    assert len(out) <= len(word) + word.count("ß")
    german2_stem(out)  # total on its own output


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="bcdfghjklmnprstvwxz", min_size=1, max_size=10))
def test_german2_ue_spelling_converges_with_umlaut(stem_part):
    """For any vowel-free consonant cluster C (no q, no u/y — a vowel
    before the u would correctly trigger the marking protection
    instead), the words C+'uen' and C+'ün' see the identical
    post-prelude form — the German2 convergence property at the unit
    level."""
    from limetrans_spark.functions.stem_de import _prelude

    spelled = _prelude(stem_part + "uen", fold_ae_oe_ue=True)
    umlaut = _prelude(stem_part + "ün", fold_ae_oe_ue=True)
    assert spelled == umlaut
