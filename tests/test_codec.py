import numpy as np
import pytest

from limetrans_spark.operators import codec


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << int(rng.integers(1, 63)), size=int(rng.integers(1, 4000)))
    assert np.array_equal(
        codec.varint_decode(codec.varint_encode(vals), len(vals)),
        vals.astype(np.int64),
    )


def test_varint_edges():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**62], dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(vals), len(vals))
    assert np.array_equal(out, vals.astype(np.int64))
    assert codec.varint_encode(np.array([], dtype=np.int64)) == b""
    assert codec.varint_decode(b"", 0).size == 0


def test_delta_roundtrip():
    rng = np.random.default_rng(7)
    docs = np.sort(rng.choice(10**12, size=500, replace=False))
    gaps = codec.delta_encode(docs, base=100)
    assert (gaps[1:] > 0).all()
    assert np.array_equal(codec.delta_decode(gaps, base=100), docs)


def test_postings_blocks():
    rng = np.random.default_rng(3)
    n = 1000
    docs = np.sort(rng.choice(10**9, size=n, replace=False))
    tfs = rng.integers(1, 100, size=n)
    db, tb, bl, bm = codec.encode_postings(docs, tfs, base=0)
    d2, t2 = codec.decode_postings(db, tb, n, base=0)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)
    assert len(bl) == len(bm) == (n + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    assert bl[-1] == docs[-1]
    for i in range(len(bl)):
        blk = tfs[i * codec.BLOCK_SIZE : (i + 1) * codec.BLOCK_SIZE]
        assert bm[i] == blk.max()
    # compression: gap+varint must beat raw int64
    assert len(db) < 8 * n


def test_positions_roundtrip():
    rng = np.random.default_rng(5)
    tfs = rng.integers(1, 30, size=50)
    pos = [np.sort(rng.choice(10000, size=int(t), replace=False)) for t in tfs]
    blob = codec.encode_positions(pos)
    back = codec.decode_positions(blob, tfs)
    for a, b in zip(pos, back):
        assert np.array_equal(a, b)
