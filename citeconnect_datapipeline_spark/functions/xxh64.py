"""Vectorized XXH64 — bit-identical to Spark's ``xxhash64``.

Spark's ``xxhash64(c1, c2, ...)`` chains the standard XXH64 primitives
over its children with the running hash as the seed (seed 42 at the
root): a string child contributes ``hashUnsafeBytes(utf8, seed)``, a
long child ``hashLong(v, seed)``, an int child ``hashInt(v, seed)``,
and a NULL child is skipped. This module reimplements those three
primitives as numpy ufunc pipelines over uint64 arrays so that an
Arrow batch of documents can be shingle-hashed / min-hashed at native
speed while producing EXACTLY the values the JVM expression produces
(property-tested against ``F.xxhash64`` in
tests/test_xxh64_kernel.py).

Why it exists (optimization guide §4.2): Catalyst higher-order
functions (``transform``/``aggregate`` lambdas) do not participate in
whole-stage codegen — the per-shingle ``xxhash64`` fold was measured
at ~35 us per shingle (r12, doc_repetition_topk). The same hash in a
vectorized Arrow batch costs nanoseconds per value, and because the
values are bit-identical, every downstream contract (LSH bands,
simhash bits, posting-list keys, oracle hashes) is unchanged.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SEED = np.uint64(42)  # Spark's default xxhash64 seed

_U64 = np.uint64
_M64 = (1 << 64) - 1


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = _U64(r)
    return (x << r_) | (x >> _U64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _P2
    h = h ^ (h >> _U64(29))
    h = h * _P3
    h = h ^ (h >> _U64(32))
    return h


def hash_long(value: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashLong for arrays: value int64/uint64, seed scalar or
    array (uint64). Returns uint64 (view as int64 for Spark longs)."""
    # modular uint64 arithmetic is the algorithm; silence numpy's
    # scalar-overflow warning (0-d inputs warn where arrays wrap)
    with np.errstate(over="ignore"):
        v = np.asarray(value).astype(np.uint64, copy=False)
        s = np.asarray(seed, dtype=np.uint64)
        h = s + _P5 + _U64(8)
        h = h ^ (_rotl(v * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def hash_int(value: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashInt for arrays: value int32-ranged, seed scalar or
    array (uint64)."""
    with np.errstate(over="ignore"):
        v = (np.asarray(value).astype(np.int64) & 0xFFFFFFFF).astype(
            np.uint64
        )
        s = np.asarray(seed, dtype=np.uint64)
        h = s + _P5 + _U64(4)
        h = h ^ (v * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)


def _hash_bytes_scalar(data: bytes, seed: int) -> int:
    """Reference scalar XXH64 over one byte string (any length) —
    the >=32-byte accumulator path plus the tail; used for the rare
    long inputs the vectorized kernel routes here."""
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + int(_P1) + int(_P2)) & _M64
        v2 = (seed + int(_P2)) & _M64
        v3 = seed & _M64
        v4 = (seed - int(_P1)) & _M64
        p1, p2 = int(_P1), int(_P2)

        def _round(acc: int, k: int) -> int:
            acc = (acc + k * p2) & _M64
            acc = ((acc << 31) | (acc >> 33)) & _M64
            return (acc * p1) & _M64

        while off + 32 <= length:
            v1 = _round(v1, int.from_bytes(data[off : off + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[off + 8 : off + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[off + 16 : off + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[off + 24 : off + 32], "little"))
            off += 32
        h = (
            (((v1 << 1) | (v1 >> 63))
             + ((v2 << 7) | (v2 >> 57))
             + ((v3 << 12) | (v3 >> 52))
             + ((v4 << 18) | (v4 >> 46)))
            & _M64
        )
        for v in (v1, v2, v3, v4):
            k = _round(0, v)
            h ^= k
            h = (h * p1 + int(_P4)) & _M64
    else:
        h = (seed + int(_P5)) & _M64
    h = (h + length) & _M64
    p1, p2 = int(_P1), int(_P2)
    while off + 8 <= length:
        k1 = int.from_bytes(data[off : off + 8], "little")
        k1 = (k1 * p2) & _M64
        k1 = ((k1 << 31) | (k1 >> 33)) & _M64
        h ^= (k1 * p1) & _M64
        h = (((h << 27) | (h >> 37)) * p1 + int(_P4)) & _M64
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(data[off : off + 4], "little") * p1) & _M64
        h = (((h << 23) | (h >> 41)) * p2 + int(_P3)) & _M64
        off += 4
    while off < length:
        h ^= (data[off] * int(_P5)) & _M64
        h = (((h << 11) | (h >> 53)) * p1) & _M64
        off += 1
    h ^= h >> 33
    h = (h * p2) & _M64
    h ^= h >> 29
    h = (h * int(_P3)) & _M64
    h ^= h >> 32
    return h


def hash_bytes_ragged(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray, seeds
) -> np.ndarray:
    """XXH64.hashUnsafeBytes over N ragged byte slices of one flat
    uint8 buffer (e.g. an Arrow StringArray's data buffer + offsets),
    with per-slice seeds. Slices < 32 bytes (the overwhelming case
    for words) run fully vectorized; longer slices fall back to the
    scalar reference per row. Returns uint64."""
    n = len(starts)
    lens = np.asarray(lens, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    seeds = np.broadcast_to(np.asarray(seeds, dtype=np.uint64), (n,))
    out = np.empty(n, dtype=np.uint64)

    big = lens >= 32
    if big.any():
        bbuf = buf.tobytes()
        for i in np.nonzero(big)[0]:
            s, ln = int(starts[i]), int(lens[i])
            out[i] = _hash_bytes_scalar(bbuf[s : s + ln], int(seeds[i]))

    small = ~big
    idx = np.nonzero(small)[0]
    if len(idx) == 0:
        return out
    s_st = starts[idx]
    s_ln = lens[idx]
    s_sd = seeds[idx]
    if len(buf) == 0:
        # every slice is zero-length: h = seed + P5 + 0, straight to fmix
        out[idx] = _fmix(s_sd + _P5)
        return out
    # gather each slice into a zero-padded (m, 32) matrix
    cols = np.arange(32, dtype=np.int64)
    gidx = s_st[:, None] + cols[None, :]
    valid = cols[None, :] < s_ln[:, None]
    np.clip(gidx, 0, len(buf) - 1, out=gidx)
    mat = np.where(valid, buf[gidx], 0).astype(np.uint8)
    words = np.ascontiguousarray(mat).view(np.uint64)  # (m, 4) LE
    u32s = np.ascontiguousarray(mat).view(np.uint32)  # (m, 8) LE

    ln_u = s_ln.astype(np.uint64)
    h = s_sd + _P5 + ln_u
    # full 8-byte words
    for j in range(3):
        mask = s_ln >= 8 * (j + 1)
        k1 = _rotl(words[:, j] * _P2, 31) * _P1
        h2 = _rotl(h ^ k1, 27) * _P1 + _P4
        h = np.where(mask, h2, h)
    # one 4-byte chunk if (len & 7) >= 4, at byte offset len & ~7
    nwords = s_ln >> 3
    has4 = (s_ln & 7) >= 4
    rows = np.arange(len(idx))
    u = u32s[rows, np.minimum(nwords * 2, 7)].astype(np.uint64)
    h2 = _rotl(h ^ (u * _P1), 23) * _P2 + _P3
    h = np.where(has4, h2, h)
    # up to 3 tail bytes
    tail_start = (nwords << 3) + np.where(has4, 4, 0)
    for t in range(3):
        pos = tail_start + t
        mask = pos < s_ln
        byte = mat[rows, np.minimum(pos, 31)].astype(np.uint64)
        h2 = _rotl(h ^ (byte * _P5), 11) * _P1
        h = np.where(mask, h2, h)
    out[idx] = _fmix(h)
    return out


def shingle_hashes_flat(
    word_buf: np.ndarray,
    word_starts: np.ndarray,
    word_lens: np.ndarray,
    doc_offsets: np.ndarray,
    n: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc n-word shingle hashes, identical to the engine's
    ``_shingle_hash_expr``: shingle i of a doc hashes words
    i..i+n-1 with chained seeds starting at 42; past-the-end words
    are NULLs and skipped (a 1- or 2-word doc yields one shorter
    shingle). Words arrive as ragged slices of one flat uint8
    buffer (Arrow string layout); ``doc_offsets`` (len D+1) bounds
    each doc's word range.

    Returns (hashes uint64 flat over all shingles in doc order,
    shingle_doc_offsets len D+1). Shingles are NOT deduplicated —
    callers needing set semantics dedupe per segment."""
    docs_nwords = np.diff(doc_offsets)
    # number of shingles per doc: max(nwords - (n-1), 1)
    n_sh = np.maximum(docs_nwords - (n - 1), 1)
    sh_off = np.concatenate(([0], np.cumsum(n_sh)))
    # shingle s of doc d starts at word doc_offsets[d] + s; every
    # layer (including the first — a zero-word doc from a NULL text
    # has NO word at position 0, and Spark's xxhash64 skips NULL
    # children, leaving the hash at its seed) is masked to the doc's
    # own word range so the chained seed matches the JVM expression
    # bit-for-bit.
    doc_idx = np.repeat(np.arange(len(docs_nwords)), n_sh)
    local = np.arange(len(doc_idx)) - sh_off[doc_idx]
    w0 = doc_offsets[doc_idx] + local  # first word index per shingle
    doc_end = doc_offsets[doc_idx + 1]
    h = np.full(len(doc_idx), _SEED, dtype=np.uint64)
    for j in range(n):
        wj = w0 + j
        present = wj < doc_end
        if not present.any():
            continue
        pidx = np.nonzero(present)[0]
        h[pidx] = hash_bytes_ragged(
            word_buf,
            word_starts[wj[pidx]],
            word_lens[wj[pidx]],
            h[pidx],
        )
    return h, sh_off


def arrow_words_to_flat(words_col) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decompose an Arrow ListArray<string> column (one row per doc,
    the JVM-split word array) into the flat ragged form the kernels
    consume: (word_buf uint8, word_starts, word_lens, doc_offsets).
    Zero-copy on the Arrow buffers."""
    import pyarrow as pa

    if isinstance(words_col, pa.ChunkedArray):
        words_col = words_col.combine_chunks()
    # list offsets -> per-doc word ranges; flatten() honors the
    # list's slice offset, so normalize doc_offsets to its base
    doc_offsets = words_col.offsets.to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    doc_offsets = doc_offsets - doc_offsets[0]
    values = words_col.flatten()  # StringArray of exactly these words
    vo = values.offset  # starts/lens below honor a sliced child
    str_off = np.frombuffer(values.buffers()[1], dtype=np.int32).astype(
        np.int64
    )
    data_buf = values.buffers()[2]
    word_buf = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, dtype=np.uint8)
    )
    starts = str_off[vo : vo + len(values)]
    ends = str_off[vo + 1 : vo + 1 + len(values)]
    lens = ends - starts
    return word_buf, starts, lens, doc_offsets
