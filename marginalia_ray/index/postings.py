"""Posting-list codec: docID-sorted deltas, varbyte, fixed blocks + block-max.

Replaces the reference's per-term static B-tree over (rankEncodedDocId, meta)
pairs (/root/reference/code/features-index/index-reverse/.../ReverseIndexFullReader.java:20-118,
.../btree/BTreeReader.java:52-91).  The reference semantics we preserve:
  * postings are sorted ascending by rank-encoded doc id (best rank first);
  * `retain` (semi-join) and `reject` (anti-join) against a candidate buffer;
  * per-term doc_freq ("numHits") read off the term directory;
  * a per-(term,doc) metadata gather for scoring.

Encoding per term:
    u32 n_docs
    u32 n_blocks
    u64[n_blocks]  block_max_docid    (skip/block-max metadata)
    u32[n_blocks]  block_byte_offset  (into the delta stream, for skipping)
    bytes          varbyte(delta(doc_ids))
    u64[n_docs]    metas              (full index only; priority index omits)

All encode/decode paths are vectorized numpy (no per-value Python loops over
the hot path beyond a bounded <=10-iteration byte-position loop).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
BLOCK_SIZE = 128


def varbyte_encode_with_sizes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128-style varbyte: 7 data bits/byte, MSB = continuation.
    Returns (byte stream, bytes-per-value)."""
    v = np.asarray(values, dtype=U64)
    n = len(v)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    # bytes needed per value: ceil(bitlen/7), min 1
    nbytes = np.ones(n, dtype=np.int64)
    x = v >> U64(7)
    while x.any():
        nbytes += (x != 0).astype(np.int64)
        x >>= U64(7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # write byte position k of every value that has >k bytes
    maxb = int(nbytes.max())
    x = v.copy()
    for k in range(maxb):
        sel = nbytes > k
        idx = starts[sel] + k
        byte = (x[sel] & U64(0x7F)).astype(np.uint8)
        cont = (k + 1 < nbytes[sel]).astype(np.uint8) << 7
        out[idx] = byte | cont
        x = x >> U64(7)
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> np.ndarray:
    return varbyte_encode_with_sizes(values)[0]


def varbyte_decode(buf: np.ndarray, n_values: int) -> np.ndarray:
    """Vectorized decode of exactly n_values varbyte integers."""
    b = np.asarray(buf, dtype=np.uint8)
    if n_values == 0:
        return np.zeros(0, dtype=U64)
    cont = (b & 0x80) != 0
    # value id per byte: 0-based index of the value this byte belongs to
    is_start = np.empty(len(b), dtype=bool)
    is_start[0] = True
    is_start[1:] = ~cont[:-1]
    value_id = np.cumsum(is_start) - 1
    # byte position within its value
    starts = np.flatnonzero(is_start)
    pos_in_value = np.arange(len(b)) - starts[value_id]
    contrib = (b.astype(U64) & U64(0x7F)) << (U64(7) * pos_in_value.astype(U64))
    out = np.zeros(n_values, dtype=U64)
    np.add.at(out, value_id[: len(contrib)], contrib)
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    v = np.asarray(sorted_ids, dtype=U64)
    d = np.empty_like(v)
    if len(v):
        d[0] = v[0]
        np.subtract(v[1:], v[:-1], out=d[1:])
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=U64), dtype=U64)


def encode_posting_list(doc_ids: np.ndarray, metas: np.ndarray | None) -> bytes:
    """doc_ids must be sorted ascending and unique; metas aligned or None."""
    ids = np.asarray(doc_ids, dtype=U64)
    n = len(ids)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_max = ids[np.minimum(np.arange(1, n_blocks + 1) * BLOCK_SIZE, n) - 1]

    deltas = delta_encode(ids)
    # per-block byte offsets: encode each block's deltas independently so a
    # reader can skip straight to a block (first delta of a block is absolute
    # relative to previous block's max, i.e. plain delta stream is fine since
    # cumsum restart requires the previous absolute value — we store absolute
    # first-value per block instead by re-basing on block boundaries).
    parts = []
    offsets = np.zeros(n_blocks, dtype=np.uint32)
    pos = 0
    for bi in range(n_blocks):
        lo = bi * BLOCK_SIZE
        hi = min(lo + BLOCK_SIZE, n)
        block = deltas[lo:hi].copy()
        block[0] = ids[lo]  # absolute first value per block -> skippable
        enc = varbyte_encode(block)
        offsets[bi] = pos
        pos += len(enc)
        parts.append(enc)

    header = np.array([n, n_blocks], dtype=np.uint32).tobytes()
    body = b"".join(
        [
            block_max.tobytes(),
            offsets.tobytes(),
            b"".join(p.tobytes() for p in parts),
        ]
    )
    if metas is not None:
        body += np.asarray(metas, dtype=U64).tobytes()
    return header + body


def encode_run(
    terms: np.ndarray, ids: np.ndarray, metas: np.ndarray | None
) -> dict:
    """Vectorized whole-run encoder: input lexsorted by (term, doc id), with
    (term, doc) pairs unique.  Zero per-term Python — every quantity is a
    reduceat/cumsum over the flat posting stream.

    Per-term streams use the same convention as encode_posting_list: values
    at block starts (every BLOCK_SIZE postings within a term) are absolute
    doc ids, others are deltas — so a term's list is decodable from its byte
    slice alone and runs concatenate deterministically.

    Returns dict with:
      term_hash  (n_terms,) u64     doc_freq (n_terms,) i64
      offset     (n_terms,) i64     nbytes   (n_terms,) i64   (delta stream)
      deltas     uint8 stream       block_max (n_blocks_total,) u64
      block_off  (n_blocks_total,) u32 (byte offset relative to term start)
      metas      aligned u64 array or None
    """
    n = len(ids)
    if n == 0:
        z64 = np.zeros(0, dtype=U64)
        zi = np.zeros(0, dtype=np.int64)
        return dict(
            term_hash=z64, doc_freq=zi, offset=zi, nbytes=zi,
            deltas=np.zeros(0, dtype=np.uint8), block_max=z64,
            block_off=np.zeros(0, dtype=np.uint32),
            metas=(np.zeros(0, dtype=U64) if metas is not None else None),
        )
    terms = np.asarray(terms, dtype=U64)
    ids = np.asarray(ids, dtype=U64)

    new_term = np.empty(n, dtype=bool)
    new_term[0] = True
    new_term[1:] = terms[1:] != terms[:-1]
    term_start = np.flatnonzero(new_term)
    df = np.diff(np.append(term_start, n))

    pos_in_term = np.arange(n, dtype=np.int64) - np.repeat(term_start, df)
    is_block_start = (pos_in_term % BLOCK_SIZE) == 0

    deltas = np.empty(n, dtype=U64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    vals = np.where(is_block_start, ids, deltas)

    enc, sizes = varbyte_encode_with_sizes(vals)
    val_off = np.cumsum(sizes) - sizes
    term_nbytes = np.add.reduceat(sizes, term_start)
    term_off = np.cumsum(term_nbytes) - term_nbytes

    block_start = np.flatnonzero(is_block_start)
    nblocks_per_term = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_end = np.append(block_start[1:], n)
    block_max = ids[block_end - 1]
    term_of_block = np.repeat(np.arange(len(df)), nblocks_per_term)
    block_off = (val_off[block_start] - term_off[term_of_block]).astype(np.uint32)

    return dict(
        term_hash=terms[term_start],
        doc_freq=df.astype(np.int64),
        offset=term_off.astype(np.int64),
        nbytes=term_nbytes.astype(np.int64),
        deltas=enc,
        block_max=block_max,
        block_off=block_off,
        metas=(np.asarray(metas, dtype=U64) if metas is not None else None),
    )


def decode_term_slice(delta_slice: np.ndarray, n_docs: int) -> np.ndarray:
    """Decode one term's doc ids from its delta-stream byte slice."""
    vals = varbyte_decode(delta_slice, n_docs)
    if n_docs == 0:
        return vals
    return PostingList._cumsum_with_block_bases(vals)


class PostingList:
    """Decoded-on-demand view over one term's encoded posting list."""

    __slots__ = ("n", "n_blocks", "block_max", "_block_offsets", "_delta_buf", "_meta_buf")

    def __init__(self, buf: memoryview | bytes, has_meta: bool):
        head = np.frombuffer(buf[:8], dtype=np.uint32)
        self.n = int(head[0])
        self.n_blocks = int(head[1])
        o = 8
        self.block_max = np.frombuffer(buf[o : o + 8 * self.n_blocks], dtype=U64)
        o += 8 * self.n_blocks
        self._block_offsets = np.frombuffer(buf[o : o + 4 * self.n_blocks], dtype=np.uint32)
        o += 4 * self.n_blocks
        meta_bytes = 8 * self.n if has_meta else 0
        delta_end = len(buf) - meta_bytes
        self._delta_buf = np.frombuffer(buf[o:delta_end], dtype=np.uint8)
        self._meta_buf = (
            np.frombuffer(buf[delta_end:], dtype=U64) if has_meta else None
        )

    @staticmethod
    def _cumsum_with_block_bases(vals: np.ndarray) -> np.ndarray:
        """cumsum restarted at every BLOCK_SIZE boundary (block-start values
        in the stream are absolute, not deltas):
        out[i] = sum(vals[block_start(i) .. i])."""
        n = len(vals)
        c = np.cumsum(vals, dtype=U64)
        n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        if n_blocks <= 1:
            return c
        starts = np.arange(1, n_blocks) * BLOCK_SIZE
        carry = c[starts - 1]  # cumsum accumulated before each block
        sizes = np.diff(np.concatenate((starts, [n])))
        sub = np.concatenate(
            (np.zeros(BLOCK_SIZE, dtype=U64), np.repeat(carry, sizes))
        )
        return c - sub

    def doc_ids(self) -> np.ndarray:
        vals = varbyte_decode(self._delta_buf, self.n)
        if self.n == 0:
            return vals
        return self._cumsum_with_block_bases(vals)

    def metas(self) -> np.ndarray | None:
        return self._meta_buf

    def doc_ids_from_block(self, first_block: int) -> tuple[np.ndarray, int]:
        """Decode doc ids starting at `first_block` (block-max skipping).
        Returns (ids, start_index_in_list)."""
        if first_block <= 0:
            return self.doc_ids(), 0
        if first_block >= self.n_blocks:
            return np.zeros(0, dtype=U64), self.n
        lo = first_block * BLOCK_SIZE
        byte_lo = int(self._block_offsets[first_block])
        vals = varbyte_decode(self._delta_buf[byte_lo:], self.n - lo)
        return self._cumsum_with_block_bases(vals), lo
