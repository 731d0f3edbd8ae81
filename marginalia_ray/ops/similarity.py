"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline: the query matrix is
broadcast once (ray.put), every batch does one float64 matmul, partial
top-k per batch, and a tiny groupby(query).map_groups merge — the input
dataset streams, nothing materializes.  The LSH-bucketed variant
(random-hyperplane signatures) is the scale path: candidates come from
matching signature buckets only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _stack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy flatten."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def knn_cosine(
    ds,
    query_vectors: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
):
    """Exact cosine top-k: (query_id, neighbor_id, score) — k rows per query,
    score rounded to 6 dp, ties broken by ascending neighbor id."""
    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64)))

    def _partial(batch: pa.Table) -> pa.Table:
        qmat, qids = ray.get(q_ref)
        v = _stack(batch[vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        scores = qmat @ vn.T  # (nq, nb)
        if exclude_self:
            mask = qids[:, None] == ids[None, :]
            scores = np.where(mask, -np.inf, scores)
        kk = min(k, scores.shape[1])
        # per-query partial top-k (ties -> lower neighbor id first)
        order = np.lexsort((ids[None, :].repeat(len(qids), 0), -scores), axis=1)[:, :kk]
        out_q = np.repeat(qids, kk)
        out_n = ids[order].ravel()
        out_s = np.take_along_axis(scores, order, axis=1).ravel()
        keep = np.isfinite(out_s)
        return pa.table(
            {
                "query_id": pa.array(out_q[keep]),
                "neighbor_id": pa.array(out_n[keep]),
                "score": pa.array(out_s[keep], pa.float64()),
            }
        )

    def _merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        n = group["neighbor_id"].to_numpy(zero_copy_only=False)
        s = group["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
                "neighbor_id": pa.array(n[order]),
                "score": pa.array(np.round(s[order], 6), pa.float64()),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_merge, batch_format="pyarrow")
    )


_EMPTY_PAIRS = {
    "id_a": pa.array([], pa.int64()),
    "id_b": pa.array([], pa.int64()),
    "score": pa.array([], pa.float64()),
}


def _ids_vecs(t: pa.Table, vec_col: str, id_col: str):
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    v = _stack(t[vec_col])
    return ids, v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)


def _pair_table(ids_a, ids_b, scores) -> pa.Table:
    """Order each pair by id value (contract: id_a < id_b)."""
    lo = np.minimum(ids_a, ids_b)
    hi = np.maximum(ids_a, ids_b)
    return pa.table(
        {
            "id_a": pa.array(lo),
            "id_b": pa.array(hi),
            "score": pa.array(np.round(scores, 6), pa.float64()),
        }
    )


def embedding_cosine_pairs(
    ds,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_rows: int = 4096,
    mode: str = "exact",
    n_planes: int = 12,
):
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, score) with
    id_a < id_b and cosine >= threshold (rounded to 6 dp).

    mode="exact" (default): all-pairs via block x block matmul tasks over
    OBJECT-STORE block refs — the dataset materializes into the (spillable)
    object store only; the driver holds B block refs, never the vectors
    (round-1 fix: no driver concat, no full-matrix broadcast).  O(n^2/2)
    compute by definition of the exact op.

    mode="lsh": hyperplane-LSH bucket first, verify exactly within each
    bucket — the linear-ish scale path; recall < 1 (pairs whose signatures
    differ are missed), same contract as knn_cosine_lsh."""
    if mode == "lsh":
        return _embedding_pairs_lsh(ds, threshold, vec_col, id_col, n_planes)

    n = ds.count()
    nb = max(1, -(-n // block_rows))
    mat = ds.select_columns([id_col, vec_col]).repartition(nb).materialize()
    refs = mat.to_arrow_refs()  # closure-held: keeps blocks alive, tiny to ship

    def _block_pair(batch: pa.Table) -> pa.Table:
        out = []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ti = ray.get(refs[i])
            ids_i, vi = _ids_vecs(ti, vec_col, id_col)
            if i == j:
                scores = vi @ vi.T
                ai, bi = np.nonzero(scores >= threshold)
                keep = ai < bi  # positional upper triangle: no dups/self
                ai, bi = ai[keep], bi[keep]
                out.append(_pair_table(ids_i[ai], ids_i[bi], scores[ai, bi]))
            else:
                ids_j, vj = _ids_vecs(ray.get(refs[j]), vec_col, id_col)
                scores = vi @ vj.T
                ai, bi = np.nonzero(scores >= threshold)
                out.append(_pair_table(ids_i[ai], ids_j[bi], scores[ai, bi]))
        if not out:
            return pa.table(_EMPTY_PAIRS)
        return pa.concat_tables(out)

    tasks = [{"i": i, "j": j} for i in range(len(refs)) for j in range(i, len(refs))]
    return ray.data.from_items(tasks).map_batches(
        _block_pair, batch_format="pyarrow", batch_size=1
    )


def _embedding_pairs_lsh(ds, threshold: float, vec_col: str, id_col: str, n_planes: int):
    """Bucket by hyperplane signature, verify exactly within each bucket.
    Each pair lands in at most one bucket (equal full signatures), so the
    output needs no dedup."""
    probe = ds.take(1)
    if not probe:
        return ray.data.from_arrow(pa.table(_EMPTY_PAIRS))
    dim = len(probe[0][vec_col])
    stage = HyperplaneLshStage(n_planes=n_planes, dim=dim, vec_col=vec_col, id_col=id_col)
    planes = stage.planes

    def _sig(batch: pa.Table) -> pa.Table:
        v = _stack(batch[vec_col])
        bits = (v @ planes.T) > 0
        buckets = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)
        return batch.append_column("bucket", pa.array(buckets, pa.uint64()))

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        ids, vn = _ids_vecs(group, vec_col, id_col)
        if len(ids) < 2:
            return pa.table(_EMPTY_PAIRS)
        scores = vn @ vn.T
        ai, bi = np.nonzero(scores >= threshold)
        keep = ai < bi
        ai, bi = ai[keep], bi[keep]
        return _pair_table(ids[ai], ids[bi], scores[ai, bi])

    return (
        ds.map_batches(_sig, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Plain Lloyd's k-means on a sample (numpy; deterministic seed)."""
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def knn_cosine_ivf(
    ds,
    query_vectors: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    sample_rows: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
):
    """IVF-flat approximate top-k: coarse quantizer (k-means fit on a
    sample by default, or caller-provided `centroids` — e.g. seeded random
    centroids, which makes the whole op a deterministic pure function of
    the data and hence SQL-oracle-checkable), vectors assigned to inverted
    lists by nearest centroid, queries probe the n_probe nearest lists.

    Scale path: the centroid table is tiny and broadcast; assignment is one
    matmul per batch; only ~n_probe/n_lists of the data is scored per
    query.  Recall < 1 by construction (same contract as knn_cosine_lsh)."""
    q = np.asarray(query_vectors, dtype=np.float64)

    if centroids is None:
        # fit the coarse quantizer on a limited sample (streaming-friendly)
        sample_t = ds.limit(sample_rows).to_pandas()
        sample = np.stack([np.asarray(v, dtype=np.float64) for v in sample_t[vec_col]])
        sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
        centroids = _kmeans_fit(sample, n_lists)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
    cent_ref = ray.put(cn)

    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    # stable sort: centroid-similarity ties break by ascending list id
    # (deterministic, and what a SQL ORDER BY sim DESC, cid mirror does)
    probe_lists = np.argsort(-(qn @ cn.T), axis=1, kind="stable")[:, :n_probe]
    probed = set(probe_lists.ravel().tolist())

    def _restrict(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        v = _stack(batch[vec_col])
        vnorm = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        assign = (vnorm @ c.T).argmax(axis=1)
        keep = np.isin(assign, np.asarray(sorted(probed)))
        return batch.filter(pa.array(keep))

    restricted = ds.map_batches(_restrict, batch_format="pyarrow")
    return knn_cosine(restricted, query_vectors, query_ids, k=k, vec_col=vec_col, id_col=id_col)


class HyperplaneLshStage:
    """Actor-pool stage: embedding batch -> (vec_id, bucket) signature rows.
    Random hyperplanes drawn once per actor from a fixed seed, so every
    actor computes identical signatures."""

    def __init__(self, n_planes: int = 16, dim: int = 64, seed: int = 7,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _stack(batch[self.vec_col])
        bits = (v @ self.planes.T) > 0
        buckets = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "bucket": pa.array(buckets, pa.uint64()),
            }
        )


def knn_cosine_lsh(
    ds,
    query_vectors: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 10,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Approximate top-k: only score vectors whose hyperplane signature
    matches a query signature (single-probe).  Scale path for brute-force;
    recall < 1 by construction.

    ONE streaming pass (round-1 fix — no driver-side candidate set, no
    second restrict pass): each batch computes its signatures and filters
    itself against the tiny sorted query-bucket array (np.isin), then the
    surviving rows flow straight into the exact scorer."""
    stage = HyperplaneLshStage(n_planes=n_planes, dim=dim, vec_col=vec_col, id_col=id_col)
    planes = stage.planes  # tiny (n_planes x dim): closure-captured, no ray.put
    q = np.asarray(query_vectors, dtype=np.float64)
    qbits = (q @ planes.T) > 0
    qbuckets = np.unique(
        (qbits.astype(np.uint64) << np.arange(qbits.shape[1], dtype=np.uint64)).sum(axis=1)
    )

    def _filt(batch: pa.Table) -> pa.Table:
        v = _stack(batch[vec_col])
        bits = (v @ planes.T) > 0
        buckets = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)
        return batch.filter(pa.array(np.isin(buckets, qbuckets)))

    restricted = ds.map_batches(_filt, batch_format="pyarrow")
    return knn_cosine(restricted, query_vectors, query_ids, k=k, vec_col=vec_col, id_col=id_col)


# ---- SemDeDup: semantic deduplication --------------------------------------


def semantic_dedup(
    ds,
    threshold: float = 0.35,
    n_lists: int = 16,
    sample_rows: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    col_chunk: int = 4096,
):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster embeddings with a
    coarse quantizer, then within each cluster drop every item that has a
    strictly-lower-id neighbor at cosine >= threshold.  (The paper keeps
    the member farthest from the centroid; this variant keeps the lowest
    id — deterministic and SQL-mirrorable, the repo-wide survivor rule.)

    Scale shape: the centroid table is tiny and broadcast (ray.put);
    assignment is one matmul per streaming batch; the within-cluster
    O(c^2) pass — the algorithm's own definition — runs per cluster after
    ONE groupby shuffle, with the matmul chunked (`col_chunk`) so memory
    stays bounded for big clusters.  n_lists controls the c^2 term: at
    100 TB you raise it so clusters stay ~sqrt-sized, exactly the paper's
    k knob.

    Output: (vec_id, cluster, keep) for every input row, keep in {0,1}."""
    if centroids is None:
        sample_t = ds.limit(sample_rows).to_pandas()
        sample = np.stack([np.asarray(v, dtype=np.float64) for v in sample_t[vec_col]])
        sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
        centroids = _kmeans_fit(sample, n_lists)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
    cent_ref = ray.put(cn)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, vn = _ids_vecs(batch, vec_col, id_col)
        # argmax takes the first maximum -> ties break to the lower
        # cluster id, mirroring SQL `ORDER BY sim DESC, cid`
        cluster = (vn @ c.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("cluster", pa.array(cluster))

    def _prune(group: pa.Table) -> pa.Table:
        ids, vn = _ids_vecs(group, vec_col, id_col)
        cluster = group["cluster"][0].as_py()
        order = np.argsort(ids, kind="stable")
        ids, vn = ids[order], vn[order]
        n = len(ids)
        dup = np.zeros(n, dtype=bool)
        rows = np.arange(n)
        for s in range(0, n, col_chunk):
            e = min(s + col_chunk, n)
            scores = vn @ vn[s:e].T  # (n, e-s)
            hit = (scores >= threshold) & (rows[:, None] < np.arange(s, e)[None, :])
            dup[s:e] = hit.any(axis=0)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(np.full(n, cluster, dtype=np.int64)),
                "keep": pa.array((~dup).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(_prune, batch_format="pyarrow")
    )


def knn_cosine_pq(
    ds,
    query_vectors: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    codebooks: np.ndarray | None = None,
    sample_rows: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
):
    """Product-quantization ADC top-k (Jégou et al. 2011): vectors are
    L2-normalized, split into `m` subspaces, and each subspace quantized
    to its nearest of `n_codes` codebook entries; a query's approximate
    cosine is the Asymmetric Distance Computation sum of per-subspace
    (query-subvector . chosen-codebook-entry) inner products.

    THE compression path for a 100-TB embedding scan: a 64-float vector
    becomes m=8 single-byte codes (32x smaller), the codebooks + per-query
    lookup tables are broadcast once, and scoring a batch is m table
    gathers + a sum — no full-precision vectors move after encoding.

    `codebooks` (shape (m, n_codes, dim/m)) may be caller-provided —
    seeded random codebooks make the op a deterministic pure function of
    the data (the knn_cosine_ivf convention) so a SQL oracle can mirror
    it; default fits one k-means per subspace on a bounded sample.

    Output: (query_id, neighbor_id, score) — k rows per query, score is
    the ADC approximation rounded to 6 dp; ordering and ties follow the
    ROUNDED score (desc), then neighbor id (asc), so results are stable
    across summation orders."""
    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    dim = qn.shape[1]
    if dim % m:
        raise ValueError(f"knn_cosine_pq: dim {dim} not divisible by m={m}")
    sub = dim // m

    if codebooks is None:
        sample_t = ds.limit(sample_rows).to_pandas()
        s = np.stack([np.asarray(v, dtype=np.float64) for v in sample_t[vec_col]])
        s /= np.maximum(np.linalg.norm(s, axis=1, keepdims=True), 1e-30)
        codebooks = np.stack(
            [
                _kmeans_fit(s[:, j * sub : (j + 1) * sub], n_codes, seed=11 + j)
                for j in range(m)
            ]
        )
    cb = np.asarray(codebooks, dtype=np.float64)
    if cb.shape != (m, n_codes, sub):
        raise ValueError(f"knn_cosine_pq: codebooks shape {cb.shape} != {(m, n_codes, sub)}")
    # per-query ADC lookup tables: (nq, m, n_codes)
    tables = np.einsum("qms,mcs->qmc", qn.reshape(-1, m, sub), cb)
    bc_ref = ray.put((cb, tables, np.asarray(query_ids, dtype=np.int64)))

    def _partial(batch: pa.Table) -> pa.Table:
        cbk, tabs, qids = ray.get(bc_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = _stack(batch[vec_col])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        sv = vn.reshape(len(ids), m, sub)
        # encode: nearest codebook entry per subspace by squared L2
        codes = np.empty((len(ids), m), np.int64)
        for j in range(m):
            d2 = ((sv[:, j, None, :] - cbk[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = np.argmin(d2, axis=1)
        # ADC: score[q, i] = sum_j tabs[q, j, codes[i, j]]
        scores = np.zeros((len(qids), len(ids)), np.float64)
        for j in range(m):
            scores += tabs[:, j, :][:, codes[:, j]]
        scores = np.round(scores, 6)
        if exclude_self:
            scores = np.where(qids[:, None] == ids[None, :], -np.inf, scores)
        kk = min(k, scores.shape[1])
        order = np.lexsort((ids[None, :].repeat(len(qids), 0), -scores), axis=1)[:, :kk]
        out_s = np.take_along_axis(scores, order, axis=1).ravel()
        keep = np.isfinite(out_s)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qids, kk)[keep]),
                "neighbor_id": pa.array(ids[order].ravel()[keep]),
                "score": pa.array(out_s[keep], pa.float64()),
            }
        )

    def _merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        n = group["neighbor_id"].to_numpy(zero_copy_only=False)
        s = group["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
                "neighbor_id": pa.array(n[order]),
                "score": pa.array(s[order], pa.float64()),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_merge, batch_format="pyarrow")
    )


def _sq_dists_seq(v: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(n, K) squared-L2 distances accumulated DIM-BY-DIM left-to-right —
    the same float addition order as a SQL engine evaluating the written-
    out `(e[1]-c1)^2 + (e[2]-c2)^2 + ...`, so argmin/tie decisions are
    bit-identical to the oracle (a blas-order einsum may differ in the
    last ulp and flip near-ties)."""
    n, dim = v.shape
    k = len(centroids)
    d = np.empty((n, k), dtype=np.float64)
    for ki in range(k):
        acc = np.zeros(n, dtype=np.float64)
        for j in range(dim):
            t = v[:, j] - centroids[ki, j]
            acc = acc + t * t
        d[:, ki] = acc
    return d


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Assign every vector to its nearest centroid (squared L2, ties to
    the lowest cluster id): (id, cluster, dist).  The map half of one
    Lloyd iteration — broadcast centroid matrix, one vectorized pass, no
    shuffle.  Compose with kmeans_update for full distributed k-means."""
    c = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(c)

    def _batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64()),
                 "dist": pa.array([], pa.float64())}
            )
        cc = ray.get(ref)
        v = _stack(batch[vec_col])
        d = _sq_dists_seq(v, cc)
        cl = d.argmin(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(cl.astype(np.int64)),
                "dist": pa.array(np.round(d[np.arange(len(v)), cl], 6)),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def kmeans_update(
    ds,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """The reduce half of one Lloyd iteration: new centroid components as
    per-(cluster, dim) means, LONG format (cluster, dim[1-based], n,
    value).  Components quantize to integer micro-units before summation
    (the repo convention) so cross-partition sums are order-independent
    and the DuckDB oracle matches exactly.  Empty clusters emit no rows.

    Scale shape: assignment + per-batch partial (K x dim) integer sums —
    the shuffle moves K*dim rows per batch, never the vectors; full
    k-means = driver loop alternating this with a tiny collect (K*dim
    values), the standard broadcast-and-reduce formulation."""
    from ray.data.aggregate import Sum

    c = np.asarray(centroids, dtype=np.float64)
    k, dim = c.shape
    ref = ray.put(c)

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"cluster": pa.array([], pa.int64()),
                 "dim": pa.array([], pa.int64()),
                 "summicro": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        cc = ray.get(ref)
        v = _stack(batch[vec_col])
        cl = _sq_dists_seq(v, cc).argmin(axis=1)
        vmicro = np.round(v * 1e6).astype(np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, cl, vmicro)
        counts = np.bincount(cl, minlength=k)
        live = np.flatnonzero(counts)
        return pa.table(
            {
                "cluster": pa.array(np.repeat(live, dim).astype(np.int64)),
                "dim": pa.array(np.tile(np.arange(1, dim + 1), len(live))),
                "summicro": pa.array(sums[live].reshape(-1)),
                "cnt": pa.array(np.repeat(counts[live], dim).astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["cluster", "dim"])
        .aggregate(Sum("summicro", alias_name="summicro"), Sum("cnt", alias_name="n"))
    )

    def _final(batch: pa.Table) -> pa.Table:
        s = batch["summicro"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "cluster": batch["cluster"],
                "dim": batch["dim"],
                "n": batch["n"],
                "value": pa.array(np.round(s / n / 1e6, 6)),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")
