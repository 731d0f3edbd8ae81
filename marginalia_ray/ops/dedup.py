"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (100 TB):
  * exact_dedup is a single hash-key groupby — the canonical shuffle;
    partial per-batch dedup happens for free because the group key is the
    content hash.
  * jaccard_pairs shuffles (shingle -> docs) once; pair blowup on hot
    shingles is capped (`max_docs_per_shingle`) exactly like stop-shingle
    dropping in MinHash literature — a shingle shared by thousands of docs
    carries no dedup signal.
  * minhash_lsh_pairs shuffles (band, bucket) once; candidate verification
    is exact Jaccard on broadcast shingle sets of ONLY the candidate docs.
  * simhash_pairs buckets by 16-bit chunks (hamming<=3 over 64 bits =>
    at least one of 4 chunks equal), the standard pigeonhole trick.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from marginalia_ray.ops.text_ops import explode_tokens

U64 = np.uint64
_MERSENNE = (1 << 61) - 1


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup by content hash: (text_hash, keep_doc_id=min, n_dups).
    md5 so the DuckDB oracle can reproduce the key."""

    def _hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        return pa.table({"text_hash": pa.array(hashes, pa.string()), id_col: batch[id_col]})

    g = ds.map_batches(_hash, batch_format="pyarrow").groupby("text_hash")
    out = g.aggregate(
        *_min_count_aggs(id_col),
    )
    return out


def _min_count_aggs(id_col: str):
    from ray.data.aggregate import Count, Min

    return [Min(id_col, alias_name="keep_doc_id"), Count(alias_name="n_dups")]


# ---- shingling ---------------------------------------------------------


def _shingle_batch(batch: pa.Table, n: int, text_col: str, id_col: str) -> pa.Table:
    """Distinct word n-gram shingles per doc: (doc_id, shingle) rows."""
    ids, toks = explode_tokens(batch, text_col, id_col)
    ids_np = ids.to_numpy(zero_copy_only=False)
    toks_np = np.asarray(toks.to_pylist(), dtype=object)
    out_ids: list = []
    out_sh: list = []
    # per-doc loop over boundaries (docs << tokens; the inner join is numpy)
    if len(ids_np):
        bounds = np.flatnonzero(np.r_[True, ids_np[1:] != ids_np[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            words = toks_np[s:e].astype(str)
            if len(words) < n:
                continue
            m = len(words) - n + 1
            sh = words[:m]
            for k in range(1, n):
                sh = np.char.add(np.char.add(sh, " "), words[k : m + k])
            sh = np.unique(sh)
            out_ids.append(np.full(len(sh), ids_np[s], dtype=ids_np.dtype))
            out_sh.append(sh)
    if not out_ids:
        return pa.table({id_col: pa.array([], pa.int64()), "shingle": pa.array([], pa.string())})
    return pa.table(
        {
            id_col: pa.array(np.concatenate(out_ids)),
            "shingle": pa.array(np.concatenate(out_sh).tolist(), pa.string()),
        }
    )


def shingles(ds, n: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    if n not in (2, 3):
        raise ValueError("word shingles supported for n in (2, 3)")
    return ds.map_batches(
        lambda b: _shingle_batch(b, n, text_col, id_col), batch_format="pyarrow"
    )


def jaccard_pairs(
    ds,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs_per_shingle: int = 1000,
):
    """Exact n-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard) with
    doc_a < doc_b and jaccard >= threshold (rounded to 6 dp).

    One shuffle: groupby(shingle) emits co-occurrence pairs; intersection
    counts aggregate by (a, b); union sizes come from a broadcast of the
    (small) per-doc shingle-count table.  At extreme scale the broadcast
    becomes a join on doc id — same plan, wider exchange.
    """
    sh = shingles(ds, n, text_col, id_col)

    # per-doc shingle counts (small: one row per doc) -> broadcast dict
    counts = sh.groupby(id_col).count()
    counts_t = counts.to_arrow_refs()
    import ray

    sizes: dict[int, int] = {}
    for ref in counts_t:
        t = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cnt = t["count()"].to_numpy(zero_copy_only=False)
        sizes.update(zip(ids.tolist(), cnt.tolist()))
    sizes_ref = ray.put(sizes)

    def _pairs(group: pa.Table) -> pa.Table:
        docs = np.unique(group[id_col].to_numpy(zero_copy_only=False))
        if len(docs) < 2 or len(docs) > max_docs_per_shingle:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(docs), k=1)
        return pa.table({"doc_a": pa.array(docs[a]), "doc_b": pa.array(docs[b])})

    inter = (
        sh.groupby("shingle")
        .map_groups(_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        i = batch["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([sz[x] for x in a], dtype=np.float64)
        nb = np.array([sz[x] for x in b], dtype=np.float64)
        j = np.round(i / (na + nb - i), 6)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b[keep]),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return inter.map_batches(_finalize, batch_format="pyarrow")


# ---- MinHash + LSH -----------------------------------------------------


def _hash_shingles_u64(sh: np.ndarray) -> np.ndarray:
    """Stable 64-bit hashes of shingle strings (vector loop in C via
    hashlib is avoided: use numpy polynomial over bytes? simplest stable:
    python hash is salted -> use blake2b 8-byte digests)."""
    out = np.empty(len(sh), dtype=U64)
    for i, s in enumerate(sh):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


def _minhash_params(num_perm: int, seed: int = 1):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHashStage:
    """Actor-pool stage: doc batch -> (doc_id, band, bucket) LSH rows +
    signature.  Permutation params built once per actor (A-pool pattern)."""

    def __init__(self, num_perm: int = 128, bands: int = 32, n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 1):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.rows = num_perm, bands, num_perm // bands
        self.n, self.text_col, self.id_col = n, text_col, id_col
        self.a, self.b = _minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = _shingle_batch(batch, self.n, self.text_col, self.id_col)
        ids = sh[self.id_col].to_numpy(zero_copy_only=False)
        shing = sh["shingle"].to_pylist()
        out_doc, out_band, out_bucket = [], [], []
        if len(ids):
            bounds = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1], True])
            for s, e in zip(bounds[:-1], bounds[1:]):
                hashes = _hash_shingles_u64(np.asarray(shing[s:e]))
                sig = _sig_vec(hashes, self.a, self.b)
                for band in range(self.bands):
                    chunk = sig[band * self.rows : (band + 1) * self.rows]
                    bucket = int.from_bytes(
                        hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
                    )
                    out_doc.append(int(ids[s]))
                    out_band.append(band)
                    out_bucket.append(bucket)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bucket, pa.uint64()),
            }
        )


def _sig_vec(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact (a*h+b) mod 2^61-1 per permutation; arbitrary-precision via
    numpy object arrays (shingle sets are small, perms=128)."""
    h_obj = hashes.astype(object)
    out = np.empty(len(a), dtype=U64)
    for i in range(len(a)):
        vals = (int(a[i]) * h_obj + int(b[i])) % _MERSENNE
        out[i] = int(vals.min())
    return out


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
):
    """MinHash+LSH near-dup candidates verified by exact Jaccard:
    (doc_a, doc_b, jaccard).  Subset of jaccard_pairs (LSH recall < 1 at
    the threshold boundary) — verified-exact but probabilistically
    complete, hence no SQL oracle."""
    import ray

    kwargs = {}
    if concurrency:
        kwargs["concurrency"] = concurrency
    else:
        kwargs["concurrency"] = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)

    lsh = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, n=n,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        **kwargs,
    )

    def _pairs(group: pa.Table) -> pa.Table:
        docs = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
        if len(docs) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(docs), k=1)
        return pa.table({"doc_a": pa.array(docs[a]), "doc_b": pa.array(docs[b])})

    cands = (
        lsh.groupby(["band", "bucket"])
        .map_groups(_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
        .drop_columns(["count()"])
    )

    # exact verification: broadcast shingle sets of candidate docs only
    cand_blocks = [t for t in (ray.get(r) for r in cands.to_arrow_refs()) if t.num_columns]
    cand_t = (
        pa.concat_tables(cand_blocks)
        if cand_blocks
        else pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    )
    cand_docs = set(cand_t["doc_a"].to_pylist()) | set(cand_t["doc_b"].to_pylist())
    if not cand_docs:
        return ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )

    sh = shingles(ds, n, text_col, id_col)
    sets: dict[int, set] = {}
    for ref in sh.to_arrow_refs():
        t = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ss = t["shingle"].to_pylist()
        for d, s in zip(ids.tolist(), ss):
            if d in cand_docs:
                sets.setdefault(d, set()).add(s)

    a_np = cand_t["doc_a"].to_numpy(zero_copy_only=False)
    b_np = cand_t["doc_b"].to_numpy(zero_copy_only=False)
    rows_a, rows_b, rows_j = [], [], []
    for x, y in zip(a_np.tolist(), b_np.tolist()):
        sa, sb = sets.get(x, set()), sets.get(y, set())
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = round(inter / (len(sa) + len(sb) - inter), 6)
        if j >= threshold:
            rows_a.append(x); rows_b.append(y); rows_j.append(j)
    return ray.data.from_arrow(
        pa.table({"doc_a": pa.array(rows_a, pa.int64()), "doc_b": pa.array(rows_b, pa.int64()),
                  "jaccard": pa.array(rows_j, pa.float64())})
    )


# ---- SimHash -----------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash over token hashes weighted by term frequency."""
    ids, toks = explode_tokens(batch, text_col, id_col)
    ids_np = ids.to_numpy(zero_copy_only=False)
    toks_l = toks.to_pylist()
    out_id, out_sh = [], []
    if len(ids_np):
        bounds = np.flatnonzero(np.r_[True, ids_np[1:] != ids_np[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            th = _hash_shingles_u64(np.asarray(toks_l[s:e]))
            bits = ((th[:, None] >> np.arange(64, dtype=U64)[None, :]) & U64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sh = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=U64)).sum())
            out_id.append(int(ids_np[s]))
            out_sh.append(sh)
    return pa.table({id_col: pa.array(out_id, pa.int64()), "simhash": pa.array(out_sh, pa.uint64())})


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup pairs by SimHash hamming distance <= max_hamming (pigeonhole
    bucketing on 16-bit chunks => exact for max_hamming <= 3)."""
    import ray

    hs = ds.map_batches(lambda b: simhash_batch(b, text_col, id_col), batch_format="pyarrow")

    def _explode_chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "simhash": [], "chunk_no": [], "chunk": []}
        for c in range(4):
            out["doc_id"].extend(ids.tolist())
            out["simhash"].extend(sh.tolist())
            out["chunk_no"].extend([c] * len(ids))
            out["chunk"].extend(((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "simhash": pa.array(out["simhash"], pa.uint64()),
                "chunk_no": pa.array(out["chunk_no"], pa.int32()),
                "chunk": pa.array(out["chunk"], pa.uint32()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        keep = np.r_[True, ids[1:] != ids[:-1]]
        ids, sh = ids[keep], sh[keep]
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int32())})
        a, b = np.triu_indices(len(ids), k=1)
        x = sh[a] ^ sh[b]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & U64(1)).astype(np.int64)
            x >>= U64(1)
        m = ham <= 3
        return pa.table({"doc_a": pa.array(ids[a][m]), "doc_b": pa.array(ids[b][m]),
                         "hamming": pa.array(ham[m].astype(np.int32))})

    pairs = (
        hs.map_batches(_explode_chunks, batch_format="pyarrow")
        .groupby(["chunk_no", "chunk"])
        .map_groups(_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .min("hamming")
    )
    return pairs.rename_columns({"min(hamming)": "hamming"}).filter(
        expr=f"hamming <= {max_hamming}"
    )
