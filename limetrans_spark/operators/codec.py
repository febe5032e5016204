"""Posting-list block codec: delta-gap + varint (PForDelta-style blocks).

The reference delegates postings storage to Lucene (via Elasticsearch,
``es8/src/main/java/hbz/limetrans/ElasticsearchClientV8.java``); this is
the from-scratch replacement the north rule asks for.

Layout per posting list (one ``(shard, term)`` run):

* doc IDs: sorted ascending → delta gaps (first = delta from shard base)
  → LEB128 varint byte stream, in blocks of ``BLOCK_SIZE`` entries.
* term frequencies: varint stream, same blocking.
* positions (optional): per posting, delta-gapped positions; varint;
  prefixed by per-posting counts (== tf, so counts are implicit).
* block metadata kept as plain int arrays next to the blobs:
  ``block_last_doc`` (skip pointers) and ``block_max_tf`` (block-max
  WAND upper bounds: the max BM25 contribution of a block is monotone
  in max tf for fixed dl bounds, so the scorer derives the bound as
  ``idf·(k1+1)·btf/(btf+K(dl_min))`` with ``dl_min`` the smallest
  *nonzero* doc length in the shard — empty doc slots carry dl 0 and
  are excluded, see ``query._wand_topk``).

Everything is NumPy-vectorized; no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def _varint_nbytes(v: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte length (vectorized)."""
    nbytes = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1 << 7)
    while True:
        more = v >= thresh
        if not more.any():
            break
        nbytes[more] += 1
        if int(thresh) > (1 << 56):
            big = v >= np.uint64(1 << 63)
            nbytes[big] = np.maximum(nbytes[big], 10)
            break
        thresh = np.uint64(int(thresh) << 7)
    return nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative int64s, vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = _varint_nbytes(v)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    shifted = v.copy()
    k = 0
    remaining = np.ones(v.shape, dtype=bool)
    while remaining.any():
        idx = np.nonzero(remaining)[0]
        byte_pos = offsets[idx] + k
        chunk = (shifted[idx] & np.uint64(0x7F)).astype(np.uint8)
        shifted[idx] = shifted[idx] >> np.uint64(7)
        more = shifted[idx] > 0
        chunk[more] |= np.uint8(0x80)
        out[byte_pos] = chunk
        remaining[:] = False
        remaining[idx[more]] = True
        k += 1
    return out.tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints from ``buf``. Vectorized."""
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_cont = (b & 0x80) != 0
    # value-end positions: bytes with high bit clear
    ends = np.nonzero(~is_cont)[0]
    assert ends.size >= count, "varint buffer truncated"
    ends = ends[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (b & 0x7F).astype(np.uint64)
    out = np.zeros(count, dtype=np.uint64)
    maxlen = int((ends - starts).max()) + 1
    for k in range(maxlen):
        pos = starts + k
        valid = pos <= ends
        out[valid] |= payload[pos[valid]] << np.uint64(7 * k)
    return out.astype(np.int64)


def delta_encode(sorted_vals: np.ndarray, base: int = 0) -> np.ndarray:
    a = np.asarray(sorted_vals, dtype=np.int64)
    gaps = np.empty_like(a)
    if a.size:
        gaps[0] = a[0] - base
        np.subtract(a[1:], a[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray, base: int = 0) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.int64)
    if g.size == 0:
        return g
    out = np.cumsum(g)
    return out + base


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, base: int = 0
) -> tuple[bytes, bytes, list[int], list[int]]:
    """Encode one posting list → (doc_blob, tf_blob, block_last_doc, block_max_tf)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doc_blob = varint_encode(delta_encode(doc_ids, base))
    tf_blob = varint_encode(tfs)
    n = doc_ids.size
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_last = [int(doc_ids[min((i + 1) * BLOCK_SIZE, n) - 1]) for i in range(nblocks)]
    block_max_tf = [int(tfs[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max()) for i in range(nblocks)]
    return doc_blob, tf_blob, block_last, block_max_tf


def decode_postings(
    doc_blob: bytes, tf_blob: bytes, n: int, base: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    doc_ids = delta_decode(varint_decode(doc_blob, n), base)
    tfs = varint_decode(tf_blob, n)
    return doc_ids, tfs


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Concatenate per-posting position lists, each delta-gapped.
    Counts == tf.  Fully vectorized: one concat, one subtract, one
    boundary reset — no per-posting Python (7M+ lists per shard run
    through here)."""
    if not positions_per_doc:
        return b""
    lens = np.fromiter(
        (len(p) for p in positions_per_doc), dtype=np.int64, count=len(positions_per_doc)
    )
    total = int(lens.sum())
    if total == 0:
        return b""
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in positions_per_doc if len(p)])
    gaps = flat.copy()
    gaps[1:] -= flat[:-1]
    boundaries = np.cumsum(lens)[:-1]
    boundaries = boundaries[boundaries < total]
    gaps[boundaries] = flat[boundaries]  # delta restarts at each list head
    return varint_encode(gaps)


def encode_positions_grouped(flat_positions: np.ndarray, lens: np.ndarray) -> list[bytes]:
    """Encode many posting-position lists in ONE vectorized pass → one
    varint bytestring per list (delta restarts at each list head).
    Concatenating the returned blobs in order yields exactly the stream
    :func:`decode_positions` expects — the SPIMI writer just joins bytes.
    """
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return [b""] * lens.size
    flat = np.asarray(flat_positions, dtype=np.int64)
    gaps = flat.copy()
    gaps[1:] -= flat[:-1]
    ends = np.cumsum(lens)
    heads = ends - lens
    heads = heads[lens > 0]
    gaps[heads] = flat[heads]
    buf = varint_encode(gaps)
    nbytes = _varint_nbytes(gaps.astype(np.uint64))
    byte_ends = np.cumsum(nbytes)
    out: list[bytes] = []
    prev_vals = 0
    prev_bytes = 0
    for n in lens:
        if n == 0:
            out.append(b"")
            continue
        end_vals = prev_vals + int(n)
        end_bytes = int(byte_ends[end_vals - 1])
        out.append(buf[prev_bytes:end_bytes])
        prev_vals, prev_bytes = end_vals, end_bytes
    return out


def decode_positions(blob: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Vectorized inverse of :func:`encode_positions`: one global cumsum,
    then subtract each list's carried-in offset."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total == 0:
        return [np.zeros(0, dtype=np.int64) for _ in tfs]
    flat = varint_decode(blob, total)
    csum = np.cumsum(flat)
    ends = np.cumsum(tfs)
    starts = ends - tfs
    carried = np.zeros(tfs.size, dtype=np.int64)
    nz = starts > 0
    carried[nz] = csum[starts[nz] - 1]
    vals = csum - np.repeat(carried, tfs)
    return np.split(vals, ends[:-1])
