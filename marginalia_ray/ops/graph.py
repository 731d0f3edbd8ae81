"""Distributed connected components over a pair graph, and the fuzzy-dedup
"apply" step built on it.

Pair-emitting dedup ops (jaccard_pairs / minhash_lsh_pairs / simhash_pairs /
exact_substring_pairs) stop at (doc_a, doc_b) edges; to actually DROP
duplicates a pipeline must group transitively-connected docs into clusters
and keep one survivor per cluster — near-dup similarity is not transitive,
so pairs alone under-delete (A~B, B~C but A!~C must still collapse to one
survivor; this is the "clustering" step of Lee et al. 2021 / Gopher /
SlimPajama dedup).

Connected components is computed with the alternating large-star /
small-star algorithm (Kiveris et al. 2014, "Connected Components in
MapReduce and Beyond"): each round is ONE hash shuffle of the edge list
(groupby the star key), converges in O(log^2 n) rounds, and at the fixpoint
every node holds a direct edge to its component minimum.  No driver-side
graph state: each round's edge set lives in the object store and the driver
only sees (count, checksum) scalars for the convergence test.  Edge lists
for dedup graphs are tiny relative to the corpus (only near-dup candidates
appear), so the per-round materialize is cheap by construction.

Scale notes (100 TB):
  * every round is a single groupby-shuffle over EDGES, not documents;
  * star processing within a partition is vectorized numpy segment-min
    (no per-group Python calls — partitions are salted hash blocks, each
    block handles all its keys at once);
  * skewed "celebrity" nodes (a boilerplate doc near-dup to millions) make
    one group large but stars strictly shrink them toward the component
    min; the cap belongs upstream in pair emission (max_docs_per_shingle),
    which all pair ops in this repo already enforce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from marginalia_ray.ops.dedup import U64, _fmix64_vec, _join_partitions

_EDGE_SCHEMA = {"lo": pa.int64(), "hi": pa.int64()}


def _edge_table(lo: np.ndarray, hi: np.ndarray) -> pa.Table:
    return pa.table({"lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())})


def _empty_edges() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _EDGE_SCHEMA.items()})


def _uniq_edges(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Dedupe (lo, hi) pairs within one block via a single lexsort."""
    if len(lo) == 0:
        return lo, hi
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    keep = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
    return lo[keep], hi[keep]


def _group_starts(keys: np.ndarray) -> np.ndarray:
    return np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])


def _groupby_key_blocks(edges, key_expr, block_fn, num_partitions: int):
    """Hash-partition edges by a derived key column and run a vectorized
    block function over each partition (all edges of a key co-located).
    The repo-wide salted-groupby pattern: never per-group map_groups calls,
    never Dataset.join."""

    def _add_pk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_pk", pa.array([], pa.int64()))
        k = key_expr(batch).astype(U64)
        pk = (_fmix64_vec(k) % U64(num_partitions)).astype(np.int64)
        return batch.append_column("_pk", pa.array(pk))

    return (
        edges.map_batches(_add_pk, batch_format="pyarrow")
        .groupby("_pk", num_partitions=num_partitions)
        .map_groups(block_fn, batch_format="pyarrow")
    )


def _large_star_block(block: pa.Table) -> pa.Table:
    """Large-star over one partition of BIDIRECTIONAL (u, v) rows grouped
    by u: for each u, m = min(N(u) + {u}); emit canonical (m, v) for every
    strictly-larger neighbor v > u.  Connects high neighbors to the local
    minimum; strictly reduces star height (Kiveris et al. Thm 1)."""
    if block.num_rows == 0:
        return _empty_edges()
    u = block["u"].to_numpy(zero_copy_only=False)
    v = block["v"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = _group_starts(u)
    # per-group min over sorted-by-(u,v) rows is the first v of the group,
    # folded with u itself
    gmin = np.minimum.reduceat(v, starts)
    m_group = np.minimum(gmin, u[starts])
    gid = np.cumsum(np.r_[0, np.diff(u) != 0])
    m = m_group[gid]
    sel = v > u
    lo, hi = _uniq_edges(m[sel], v[sel])
    # m <= u < v always, so (lo, hi) is canonical and self-loop-free
    return _edge_table(lo, hi)


def _small_star_block(block: pa.Table) -> pa.Table:
    """Small-star over one partition of CANONICAL (lo, hi) rows grouped by
    hi: for each hi, m = min of its smaller neighbors; re-point every other
    small neighbor and hi itself at m."""
    if block.num_rows == 0:
        return _empty_edges()
    lo = block["lo"].to_numpy(zero_copy_only=False)
    hi = block["hi"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lo, hi))
    lo, hi = lo[order], hi[order]
    starts = _group_starts(hi)
    m_group = np.minimum.reduceat(lo, starts)
    gid = np.cumsum(np.r_[0, np.diff(hi) != 0])
    m = m_group[gid]
    sel = lo != m
    out_lo = np.concatenate([m[sel], m_group])
    out_hi = np.concatenate([lo[sel], hi[starts]])
    lo2, hi2 = _uniq_edges(out_lo, out_hi)
    return _edge_table(lo2, hi2)


def _edge_checksum(edges) -> int:
    """Order-independent xor checksum of a materialized edge set — the
    strong half of the convergence test (the cheap half is the free
    metadata count()).  One streaming pass; only tiny per-block partials
    reach the driver."""

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"s": pa.array([], pa.int64())})
        lo = batch["lo"].to_numpy(zero_copy_only=False).astype(U64)
        hi = batch["hi"].to_numpy(zero_copy_only=False).astype(U64)
        chk = int(np.bitwise_xor.reduce(_fmix64_vec(_fmix64_vec(lo) ^ hi)))
        return pa.table({"s": pa.array([chk - (1 << 63)], pa.int64())})

    s = 0
    for b in edges.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for x in b["s"].to_numpy(zero_copy_only=False):
            s ^= int(x) & ((1 << 64) - 1)
    return s


def _local_cc_block(block: pa.Table) -> pa.Table:
    """Single-task connected components over one edge block: dense-remap
    node ids, then vectorized min-label propagation with pointer doubling —
    O((E+V) log V) numpy, no Python per-edge loop.  Emits star edges
    (component min -> member) for every non-root member."""
    if block.num_rows == 0:
        return _empty_edges()
    lo = block["lo"].to_numpy(zero_copy_only=False)
    hi = block["hi"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    l_idx, h_idx = inv[: len(lo)], inv[len(lo) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        nl = label.copy()
        np.minimum.at(nl, h_idx, label[l_idx])
        np.minimum.at(nl, l_idx, label[h_idx])
        nl = np.minimum(nl, nl[nl])  # pointer doubling
        if np.array_equal(nl, label):
            break
        label = nl
    member = np.flatnonzero(label != np.arange(len(nodes)))
    return _edge_table(nodes[label[member]], nodes[member])


def connected_components(
    edges,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 64,
    local_cap: int = 2_000_000,
):
    """Edge Dataset (a_col, b_col) -> star-edge Dataset (lo=component
    root candidate, hi=member).  At convergence every non-root node has
    exactly one edge to its component minimum.  Nodes with no edges simply
    don't appear (the caller unions its node list; see `components_apply`).

    Each round materializes the (small) edge set — required for an
    iterative algorithm on a lazy Dataset, and documented as safe because
    dedup edge lists are candidate pairs, not the corpus.  The shuffle
    partition count scales with the edge count (~100k edges/partition, up
    to the repo-wide cap), so tiny graphs pay one task per round while
    100-TB candidate graphs still spread across the cluster."""

    def _canon(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_edges()
        a = batch[a_col].to_numpy(zero_copy_only=False)
        b = batch[b_col].to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = _uniq_edges(np.minimum(a, b), np.maximum(a, b))
        return _edge_table(lo, hi)

    def _bidir(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "v": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    e = edges.map_batches(_canon, batch_format="pyarrow").materialize()
    n_prev = e.count()
    if n_prev <= local_cap:
        # hybrid fast path (the standard Spark/MapReduce CC optimization):
        # a dedup candidate graph is usually far smaller than the corpus —
        # solve it in ONE task instead of paying per-round shuffle fixed
        # costs; ~2M edges is ~32 MB, trivially within a worker heap
        return e.repartition(1).map_batches(
            _local_cc_block, batch_format="pyarrow", batch_size=None
        )
    num_partitions = max(1, min(_join_partitions(), -(-n_prev // 100_000)))
    chk_prev: int | None = None
    for _ in range(max_rounds):
        bidir = e.map_batches(_bidir, batch_format="pyarrow")
        after_large = _groupby_key_blocks(
            bidir, lambda b: b["u"].to_numpy(zero_copy_only=False), _large_star_block,
            num_partitions,
        )
        e2 = _groupby_key_blocks(
            after_large, lambda b: b["hi"].to_numpy(zero_copy_only=False),
            _small_star_block, num_partitions,
        ).materialize()
        n_cur = e2.count()
        if n_cur == n_prev:
            # counts stable: confirm with the strong (one-pass) checksum
            if chk_prev is None:
                chk_prev = _edge_checksum(e)
            chk_cur = _edge_checksum(e2)
            if chk_cur == chk_prev:
                return e2
            chk_prev = chk_cur
        else:
            chk_prev = None
        e, n_prev = e2, n_cur
    raise RuntimeError(
        f"connected_components: no convergence after {max_rounds} rounds "
        f"(edges={n_prev}) — pathological graph, check pair-emission caps"
    )


def components_apply(node_ds, star_edges, id_col: str = "doc_id"):
    """Label every node with its component minimum: union the star edges
    (hi -> lo) with the identity labels (node -> node) and take the min
    label per node — one groupby shuffle over n_nodes + n_edges rows.
    Output: (id_col, component); component == own id for survivors."""

    def _ident(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        return pa.table({id_col: ids, "component": ids})

    def _from_edges(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch["hi"], "component": batch["lo"]})

    labeled = node_ds.map_batches(_ident, batch_format="pyarrow").union(
        star_edges.map_batches(_from_edges, batch_format="pyarrow")
    )
    from marginalia_ray.ops.relational import bucketed_group_agg

    out = bucketed_group_agg(labeled, [id_col], ["component"], "min")
    return out.rename_columns({"min(component)": "component"})


def fuzzy_dedup_components(
    ds,
    threshold: float = 0.5,
    method: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    cc_local_cap: int = 2_000_000,
    **pair_kwargs,
):
    """End-to-end fuzzy-dedup clustering: near-dup pairs (MinHash+LSH with
    exact Jaccard verification by default, or exact jaccard_pairs) ->
    connected components -> every document labeled with its duplicate
    cluster's minimum id.  A training pipeline keeps rows where
    doc_id == component (or samples one per component).

    Output: (doc_id, component) for EVERY input document — singletons are
    their own component."""
    from marginalia_ray.ops.dedup import jaccard_pairs, minhash_lsh_pairs

    if method == "minhash":
        pairs = minhash_lsh_pairs(ds, threshold=threshold, text_col=text_col,
                                  id_col=id_col, **pair_kwargs)
    elif method == "jaccard":
        pairs = jaccard_pairs(ds, threshold=threshold, text_col=text_col,
                              id_col=id_col, **pair_kwargs)
    else:
        raise ValueError(f"fuzzy_dedup_components: unknown method {method!r}")

    stars = connected_components(
        pairs, a_col="doc_a", b_col="doc_b", local_cap=cc_local_cap
    )
    return components_apply(ds.select_columns([id_col]), stars, id_col=id_col)


def near_dedup_apply(
    ds,
    threshold: float = 0.5,
    method: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dropped_ids: int = 20_000_000,
    cc_local_cap: int = 2_000_000,
    **pair_kwargs,
):
    """Fuzzy dedup, APPLIED: the surviving corpus rows (all original
    columns), one survivor (the cluster-minimum id) per near-dup cluster.
    The end-to-end "dedup my corpus" pipeline a training run actually
    wants: pairs -> connected components -> drop non-minimum members.

    Scale contract: the only driver-side state is the DROPPED id set —
    exactly the `hi` side of the converged star edges (every non-root
    member has one star edge), bounded by the near-dup candidate count,
    NOT the corpus (same cap convention as minhash_lsh_pairs' candidate
    collect).  Under `max_dropped_ids` the set is broadcast and the final
    step is a streamed anti-filter; above it (round-4: fallback, not a
    hard error) nothing is collected — the anti-filter becomes a
    dataset-side anti-semi-join co-partitioned on the id (one extra
    shuffle of the corpus payload), identical results.  Survivors never
    materialize anywhere."""
    import ray

    from marginalia_ray.ops.dedup import jaccard_pairs, minhash_lsh_pairs, semi_join_ids

    if method == "minhash":
        pairs = minhash_lsh_pairs(ds, threshold=threshold, text_col=text_col,
                                  id_col=id_col, **pair_kwargs)
    elif method == "jaccard":
        pairs = jaccard_pairs(ds, threshold=threshold, text_col=text_col,
                              id_col=id_col, **pair_kwargs)
    else:
        raise ValueError(f"near_dedup_apply: unknown method {method!r}")

    stars = connected_components(
        pairs, a_col="doc_a", b_col="doc_b", local_cap=cc_local_cap
    ).materialize()
    n_drop = stars.count()
    if n_drop == 0:
        return ds

    if n_drop > max_dropped_ids:
        # scale path: anti-semi-join against the dropped-id dataset —
        # zero driver growth, one extra shuffle of the corpus payload
        def _hi_col(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "hi" not in b.column_names:
                return pa.table({id_col: pa.array([], pa.int64())})
            return pa.table({id_col: b["hi"].cast(pa.int64())})

        return semi_join_ids(
            ds, stars.map_batches(_hi_col, batch_format="pyarrow"), id_col,
            anti=True,
        )

    drop_parts = [np.zeros(0, dtype=np.int64)]
    for b in stars.iter_batches(batch_format="pyarrow"):
        if b.num_rows and "hi" in b.column_names:
            drop_parts.append(b["hi"].to_numpy(zero_copy_only=False))
    dropped = np.unique(np.concatenate(drop_parts))
    if len(dropped) == 0:
        return ds
    drop_ref = ray.put(dropped)

    def _anti(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, ray.get(drop_ref))))

    return ds.map_batches(_anti, batch_format="pyarrow")


def soft_dedup_weights(
    ds,
    threshold: float = 0.5,
    method: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    **pair_kwargs,
):
    """Soft deduplication (SoftDeDup, Xia et al. 2024, ACL): instead of
    DROPPING near-dup cluster members, every document gets a sampling
    weight inversely proportional to its duplicate-cluster size —
    duplicated content is down-weighted, not discarded, which the paper
    shows beats hard dedup for pretraining loss at equal compute.

    Pipeline: near-dup pairs -> connected components (the same machinery
    as near_dedup_apply) -> ONE salted hash-partition shuffle of
    (component, doc_id) 16-byte rows; inside each partition every
    component's members are co-located, so sizes come from one sorted
    segment pass (lexsort + reduceat — NOT per-group map_groups calls:
    at corpus scale almost every doc is a singleton component and a
    call-per-group would mean one Python call per document).  Singletons
    are their own cluster (weight 1.0).  No driver-side state beyond
    connected_components' converged star edges.

    Output: (doc_id, cluster_size, weight) for EVERY input document."""
    comp = fuzzy_dedup_components(
        ds, threshold=threshold, method=method, text_col=text_col,
        id_col=id_col, **pair_kwargs,
    )

    def _sizes_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster_size": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        c = block["component"].to_numpy(zero_copy_only=False)
        ids = block[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        c, ids = c[order], ids[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        sizes_g = np.diff(np.r_[starts, len(c)])
        gid = np.cumsum(np.r_[False, c[1:] != c[:-1]])
        sizes = sizes_g[gid]
        w = np.floor(1_000_000 / sizes + 0.5) / 1_000_000
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster_size": pa.array(sizes, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )

    return _groupby_key_blocks(
        comp,
        lambda b: b["component"].to_numpy(zero_copy_only=False),
        _sizes_block,
        _join_partitions(),
    )


# ---------------------------------------------------------------------------
# Website adjacencies: similar-domains via weighted cosine over inlink sets
# ---------------------------------------------------------------------------

def _dest_key_part(batch: pa.Table, num_partitions: int, col: str) -> pa.Table:
    if batch.num_rows == 0:
        return batch.append_column("_pk", pa.array([], pa.int64()))
    v = batch[col].to_numpy(zero_copy_only=False).astype(U64)
    return batch.append_column(
        "_pk", pa.array((_fmix64_vec(v) % U64(num_partitions)).astype(np.int64))
    )


def domain_adjacencies(
    edges,
    source_col: str = "source",
    dest_col: str = "dest",
    *,
    threshold: float = 0.1,
    min_probe_card: int = 10,
    top_k: int = 128,
    max_card: int = 10_000,
    max_domains: int = 50_000_000,
    max_fanout: int = 200_000,
    num_partitions: int | None = None,
):
    """Similar-domain discovery: the reference's website-adjacencies
    calculator (``tools/website-adjacencies-calculator/.../
    WebsiteAdjacenciesCalculator.java:128-190``, ``AdjacenciesData.java:
    38-127``), the batch job that fills ``EC_NEIGHBORS_VIEW`` for the
    similar-websites browse feature (``DbBrowseDomainsSimilarCosine.java``).

    Semantics (ported exactly):
      * each dest domain's vector is its distinct inlink sources PLUS
        itself (``createBitmapWithSelf``); dests with cardinality >=
        ``max_card`` are dropped from the universe entirely
        (``isEligible``);
      * a source's weight is ``1/ln(2 + card(source-as-dest))`` when the
        source is itself an eligible dest, else 0 (``getWeights`` only
        fills ids in the dest list — array default 0 elsewhere);
      * a pair scores when BOTH the unweighted cosine
        ``|a&b|/sqrt(|a||b|)`` and the weighted cosine
        ``sum_w(a&b)/sqrt(sum_w(a) sum_w(b))`` exceed ``threshold``
        (the cheap-then-expensive chain keeps both strict > tests);
      * per probe domain a: card(a) >= ``min_probe_card``
        (``cardinalityExceeds(10)`` is >=), candidates need card(b) >=
        max(2, trunc(0.01 card(a))), and only the ``top_k`` highest
        relatedness neighbors survive.

    Determinism divergence (documented): the reference's 128-cap keeps
    ties in hash-iteration order; here ties break by (relatedness desc,
    neighbor_id asc) and relatedness is rounded to 6 dp before the cut so
    the result is a pure function of the graph.

    Scale (100 TB / 1e8-domain graph): three keyed shuffles of the
    DISTINCT edge list (by dest, by source, by pair salt) plus the final
    per-domain top-k groupby; the only driver/broadcast state is the
    per-eligible-domain stats table (card + weighted norm, two f64 per
    domain), capped at ``max_domains`` with a loud error.  The unweighted
    cosine filter is evaluated in exact integer arithmetic
    (``100 cnt^2 > card_a card_b``) so Ray and SQL oracles agree bit-for-
    bit.  Hub sources whose dest fanout exceeds ``max_fanout`` raise
    rather than silently emitting O(fanout^2) pairs — cap outlink fanout
    upstream (the crawler does: links-per-page bound).

    Output: (domain_id, neighbor_id, relatedness) — both directions, each
    direction filtered by its own probe-side rules.
    """
    import ray

    if num_partitions is None:
        num_partitions = _join_partitions()

    def _norm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"s": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        s, d = batch[source_col], batch[dest_col]
        if s.null_count or d.null_count:
            raise TypeError("domain_adjacencies: null ids in edge columns")
        s64 = s.cast(pa.int64()).to_numpy(zero_copy_only=False)
        d64 = d.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # self edge per dest (createBitmapWithSelf); dupes collapse below
        return pa.table({
            "s": pa.array(np.concatenate([s64, d64])),
            "d": pa.array(np.concatenate([d64, d64])),
        })

    def _dedup_block(block: pa.Table) -> pa.Table:
        """Per-dest partition: distinct sources, card, eligibility."""
        empty = pa.table({"s": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64()),
                          "card": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        if "_pk" in block.column_names:
            block = block.drop_columns(["_pk"])
        s = block["s"].to_numpy(zero_copy_only=False)
        d = block["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, d))
        s, d = s[order], d[order]
        keep = np.r_[True, (d[1:] != d[:-1]) | (s[1:] != s[:-1])]
        s, d = s[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        counts = np.diff(np.append(starts, len(d)))
        card = np.repeat(counts, counts)
        elig = card < max_card
        if not elig.any():
            return empty
        return pa.table({"s": pa.array(s[elig]), "d": pa.array(d[elig]),
                         "card": pa.array(card[elig])})

    dedup = (
        edges.map_batches(_norm, batch_format="pyarrow")
        .map_batches(lambda b: _dest_key_part(b, num_partitions, "d"),
                     batch_format="pyarrow")
        .groupby("_pk", num_partitions=num_partitions)
        .map_groups(_dedup_block, batch_format="pyarrow")
        .materialize()
    )

    # per-eligible-domain cards -> driver (THE broadcast small side)
    dparts, cparts = [], []
    for b in dedup.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        dn = b["d"].to_numpy(zero_copy_only=False)
        first = np.r_[True, dn[1:] != dn[:-1]]  # runs are contiguous per block
        dparts.append(dn[first])
        cparts.append(b["card"].to_numpy(zero_copy_only=False)[first])
    if not dparts:
        import ray.data

        return ray.data.from_arrow(
            pa.table({"domain_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "relatedness": pa.array([], pa.float64())})
        )
    dvals = np.concatenate(dparts)
    cards = np.concatenate(cparts)
    order = np.argsort(dvals, kind="stable")
    dvals, cards = dvals[order], cards[order]
    first = np.r_[True, dvals[1:] != dvals[:-1]]
    dvals, cards = dvals[first], cards[first]
    if len(dvals) > max_domains:
        raise RuntimeError(
            f"domain_adjacencies: {len(dvals)} eligible domains exceeds "
            f"max_domains={max_domains}; raise the cap or shard the graph"
        )
    wvals = 1.0 / np.log(2.0 + cards)
    # broadcast ONCE (ray.put) — the weight table is per-domain-sized and
    # must not be re-shipped inside each transform's closure at scale
    w_ref = ray.put((dvals, wvals))

    def _w_of_bcast(ids: np.ndarray) -> np.ndarray:
        dv, wv = ray.get(w_ref)
        pos = np.clip(np.searchsorted(dv, ids), 0, len(dv) - 1)
        hit = dv[pos] == ids
        return np.where(hit, wv[pos], 0.0)

    # weighted norm per dest: one groupby-sum over the distinct edges
    def _with_w(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        s = batch["s"].to_numpy(zero_copy_only=False)
        return pa.table({"d": batch["d"], "w": pa.array(_w_of_bcast(s))})

    from marginalia_ray.ops.relational import bucketed_group_agg

    wn = bucketed_group_agg(
        dedup.map_batches(_with_w, batch_format="pyarrow"), ["d"], ["w"]
    )
    wnorm = np.zeros(len(dvals), dtype=np.float64)
    for b in wn.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        dn = b["d"].to_numpy(zero_copy_only=False)
        sv = b["sum(w)"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dvals, dn)
        wnorm[pos] = sv
    stats_ref = ray.put((dvals, cards.astype(np.int64), wnorm))

    def _pairs_block(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "pcnt": pa.array([], pa.int64()),
                          "pw": pa.array([], pa.float64())})
        if block.num_rows == 0:
            return empty
        if "_pk" in block.column_names:
            block = block.drop_columns(["_pk"])
        s = block["s"].to_numpy(zero_copy_only=False)
        d = block["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.append(starts[1:], len(s))
        ws = _w_of_bcast(s[starts])
        a_out, b_out, w_out = [], [], []
        for (st, en), w in zip(zip(starts, ends), ws):
            g = d[st:en]
            if len(g) < 2:
                continue
            if len(g) > max_fanout:
                raise RuntimeError(
                    f"domain_adjacencies: source fanout {len(g)} exceeds "
                    f"max_fanout={max_fanout}; bound outlinks upstream"
                )
            ia, ib = np.triu_indices(len(g), k=1)
            a_out.append(g[ia])
            b_out.append(g[ib])
            w_out.append(np.full(len(ia), w))
        if not a_out:
            return empty
        t = pa.table({
            "doc_a": pa.array(np.concatenate(a_out)),
            "doc_b": pa.array(np.concatenate(b_out)),
            "pw": pa.array(np.concatenate(w_out)),
        })
        # per-partition combiner: collapse repeats of a pair across the
        # partition's sources before the global pair shuffle
        return (
            t.group_by(["doc_a", "doc_b"])
            .aggregate([([], "count_all"), ("pw", "sum")])
            .rename_columns(["doc_a", "doc_b", "pcnt", "pw"])
        )

    pairs = (
        dedup.map_batches(lambda b: _dest_key_part(b, num_partitions, "s"),
                          batch_format="pyarrow")
        .groupby("_pk", num_partitions=num_partitions)
        .map_groups(_pairs_block, batch_format="pyarrow")
    )

    from marginalia_ray.ops.dedup import _salted_pair_agg

    def _agg_pairs(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64()),
                          "wsum": pa.array([], pa.float64())})
        if block.num_rows == 0:
            return empty
        return (
            block.group_by(["doc_a", "doc_b"])
            .aggregate([("pcnt", "sum"), ("pw", "sum")])
            .rename_columns(["doc_a", "doc_b", "cnt", "wsum"])
        )

    agg = _salted_pair_agg(pairs, _agg_pairs, num_partitions=num_partitions)

    thr2 = threshold * threshold

    def _score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"domain_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "relatedness": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        dv, cv, wv = ray.get(stats_ref)
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        wsum = batch["wsum"].to_numpy(zero_copy_only=False)

        def stat(ids):
            pos = np.clip(np.searchsorted(dv, ids), 0, len(dv) - 1)
            return cv[pos], wv[pos]  # all ids present: pair gen uses elig rows

        ca, wa = stat(a)
        cb, wb = stat(b)
        # shared filters, exact integer unweighted-cosine test
        shared = (cnt * cnt * 10000).astype(np.int64) > (
            ca * cb * int(round(10000 * thr2))
        )
        wprod = wa * wb
        shared &= (wsum * wsum) > thr2 * wprod
        rel = np.round(wsum / np.sqrt(np.maximum(wprod, 1e-300)), 6)

        def direction(pa_, pb_, cpa, cpb):
            keep = shared & (cpa >= min_probe_card)
            card_min = np.maximum(2, (0.01 * cpa).astype(np.int64))
            keep &= cpb >= card_min
            return pa_[keep], pb_[keep], rel[keep]

        a1, b1, r1 = direction(a, b, ca, cb)
        a2, b2, r2 = direction(b, a, cb, ca)
        return pa.table({
            "domain_id": pa.array(np.concatenate([a1, a2])),
            "neighbor_id": pa.array(np.concatenate([b1, b2])),
            "relatedness": pa.array(np.concatenate([r1, r2])),
        })

    scored = agg.map_batches(_score, batch_format="pyarrow")

    # per-domain top-k: bucketed partitions with vectorized segment ranks
    # (a per-domain map_groups costs one Python task per domain — at 1e8
    # domains that is the scheduler, not the work)
    def _topk_key(batch: pa.Table) -> pa.Table:
        d = batch["domain_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pk = (_fmix64_vec(d.astype(np.uint64)) % U64(num_partitions)).astype(
            np.int64
        )
        return batch.append_column("_tk", pa.array(pk))

    def _topk_part(part: pa.Table) -> pa.Table:
        empty = pa.table({"domain_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "relatedness": pa.array([], pa.float64())})
        if part.num_rows == 0:
            return empty
        d = part["domain_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = part["neighbor_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        r = part["relatedness"].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, -r, d))
        d_s = d[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        seg = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(d_s)]))
        pos = np.arange(len(d_s)) - starts[seg]
        keep = order[pos < top_k]
        return pa.table({"domain_id": pa.array(d[keep]),
                         "neighbor_id": pa.array(n[keep]),
                         "relatedness": pa.array(r[keep].astype(np.float64))})

    return (
        scored.map_batches(_topk_key, batch_format="pyarrow")
        .groupby("_tk")
        .map_groups(_topk_part, batch_format="pyarrow")
    )


def pagerank_scores(
    edges,
    d_num: int = 85,
    d_den: int = 100,
    iterations: int = 3,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    max_edges: int = 200_000_000,
):
    """PageRank with EXACT integer arithmetic — the oracle-checkable
    sibling of pipelines/domain_rank.pagerank (G6; RankingAlgorithm.java
    semantics, power iteration with dangling redistribution).  Ranks are
    micro-units of `scale` total mass; the damping factor is the rational
    d_num/d_den and every step uses floor division, so the result is a
    pure integer function of the edge list that SQL reproduces bit-exactly
    (floats would drift on summation order).

    Iteration: contrib_i = r_i // deg_i (non-dangling); dm = sum(r_dangling)
    // n; r'_j = ((d_den-d_num)*scale) // (d_den*n) + (d_num*(acc_j+dm)) // d_den.

    Scale shape: edge dedup is distributed (per-batch distinct + one
    groupby shuffle); the compacted DOMAIN-level graph then iterates on
    the driver in numpy CSR — domains are 4-5 orders of magnitude fewer
    than documents (same justification as domain_rank.pagerank, capped
    loudly at `max_edges`); each iteration is expressible as a
    groupby(dst).sum over (src, dst, contrib) rows if a graph ever
    outgrows one machine.

    Output: Dataset (node, rank) — rank in integer micro-units."""
    import ray.data as _rd

    def _dedup_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        return (
            pa.table({"src": b[src_col].cast(pa.int64()), "dst": b[dst_col].cast(pa.int64())})
            .group_by(["src", "dst"])
            .aggregate([])
        )

    ded = (
        edges.map_batches(_dedup_batch, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
    )

    srcs, dsts = [np.empty(0, np.int64)], [np.empty(0, np.int64)]
    n_e = 0
    for b in ded.iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        srcs.append(b["src"].to_numpy(zero_copy_only=False).astype(np.int64))
        dsts.append(b["dst"].to_numpy(zero_copy_only=False).astype(np.int64))
        n_e += b.num_rows
        if n_e > max_edges:
            raise RuntimeError(
                f"pagerank_scores: >{max_edges} distinct edges — iterate "
                "with the groupby(dst) exchange instead (see docstring)."
            )
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    if len(src) == 0:
        return _rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})
        )

    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    s = np.searchsorted(nodes, src)
    g = np.searchsorted(nodes, dst)
    deg = np.bincount(s, minlength=n).astype(np.int64)
    dangling = deg == 0

    base = ((d_den - d_num) * scale) // (d_den * n)
    r = np.full(n, scale // n, dtype=np.int64)
    # exact int64 accumulation (np.bincount weights would round through
    # float64 above 2^53).  Overflow bound: acc_j <= sum of ALL
    # contributions <= total mass ~= scale (each source contributes at
    # most its own rank across its out-edges), and dm <= scale, so the
    # largest intermediate is d_num * 2 * scale — a property of the
    # PARAMETERS, not the graph; no per-graph guard needed.
    if d_num * 2 * scale >= 2**63:
        raise ValueError(
            "pagerank_scores: d_num * 2 * scale must stay below 2^63 — "
            "lower `scale`"
        )
    for _ in range(iterations):
        contrib = np.where(dangling, 0, r // np.maximum(deg, 1))
        acc_i = np.zeros(n, np.int64)
        np.add.at(acc_i, g, contrib[s])
        dm = int(r[dangling].sum()) // n
        r = base + (d_num * (acc_i + dm)) // d_den

    return _rd.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64()), "rank": pa.array(r, pa.int64())})
    )


def graph_degree_stats(edges, src_col: str = "src", dst_col: str = "dst"):
    """Per-node in/out degree over the DISTINCT edge list — the degree
    profile read before choosing PageRank damping / hub treatment
    (SURVEY G6-family diagnostics).

    Two aggregate-sized shuffles: one groupby to global-distinct the
    edges, then per-batch (node, out, in) partials -> groupby(node).sum
    — no join, both directions ride the same shuffle.
    Output: (node, out_deg, in_deg)."""

    def _dedup(batch: pa.Table) -> pa.Table:
        return (
            pa.table({src_col: batch[src_col], dst_col: batch[dst_col]})
            .group_by([src_col, dst_col])
            .aggregate([])
        )

    distinct = (
        edges.map_batches(_dedup, batch_format="pyarrow")
        .groupby([src_col, dst_col])
        .count()  # one row per distinct edge; the count column is unused
    )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "o": pa.array([], pa.int64()),
                    "i": pa.array([], pa.int64()),
                }
            )
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        su, sc = np.unique(src, return_counts=True)
        du, dc = np.unique(dst, return_counts=True)
        return pa.table(
            {
                "node": pa.array(np.concatenate([su, du])),
                "o": pa.array(
                    np.concatenate([sc, np.zeros(len(du), np.int64)])
                ),
                "i": pa.array(
                    np.concatenate([np.zeros(len(su), np.int64), dc])
                ),
            }
        )

    agg = (
        distinct.map_batches(_partial, batch_format="pyarrow")
        .groupby("node")
        .sum(["o", "i"])
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"].cast(pa.int64()),
                "out_deg": batch["sum(o)"].cast(pa.int64()),
                "in_deg": batch["sum(i)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


_GOLD = U64(0x9E3779B97F4A7C15)


def _pair_key(v: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pair-determined uint64 key for co-partitioning (v, w) rows;
    _groupby_key_blocks fmixes it again, so a cheap combine suffices."""
    return v.astype(U64) * _GOLD + w.astype(U64)


def _wedge_pairs(dst: np.ndarray, starts: np.ndarray):
    """All ordered within-group pairs (dst[i], dst[j]), i < j, for groups
    delimited by `starts` over a group-sorted array — fully vectorized
    (the np.repeat/arange segment trick, no Python over groups)."""
    n = len(dst)
    ends = np.r_[starts[1:], n]
    counts = ends - starts
    grp_end = np.repeat(ends, counts)
    rep = grp_end - np.arange(n) - 1
    total = int(rep.sum())
    vi = np.repeat(np.arange(n), rep)
    offsets = np.cumsum(rep) - rep
    wj = np.arange(total) - np.repeat(offsets, rep) + vi + 1
    return dst[vi], dst[wj]


def _pair_match_counts(
    ev: np.ndarray,
    ew: np.ndarray,
    qv: np.ndarray,
    qw: np.ndarray,
    qcnt: np.ndarray,
) -> int:
    """Sum qcnt over query pairs (qv, qw) present in the DISTINCT edge
    set (ev, ew).  Lookup is by sorted pair key with an EXACT (v, w)
    verification of every hit, so a uint64 key collision can only cause
    a loud error (duplicate key in a distinct edge set), never a silent
    miscount."""
    if len(ev) == 0 or len(qv) == 0:
        return 0
    ek = _pair_key(ev, ew)
    order = np.argsort(ek, kind="stable")
    ek, ev_s, ew_s = ek[order], ev[order], ew[order]
    if (np.diff(ek) == 0).any():
        raise RuntimeError(
            "triangle_count: pair-key collision between distinct edges"
        )
    qk = _pair_key(qv, qw)
    pos = np.searchsorted(ek, qk)
    pos = np.minimum(pos, len(ek) - 1)
    hit = (ek[pos] == qk) & (ev_s[pos] == qv) & (ew_s[pos] == qw)
    return int(qcnt[hit].sum())


def _count_pairs(v: np.ndarray, w: np.ndarray):
    """Collapse duplicate (v, w) rows to (v, w, count) via one lexsort."""
    if len(v) == 0:
        return v, w, np.array([], np.int64)
    order = np.lexsort((w, v))
    v, w = v[order], w[order]
    starts = np.flatnonzero(np.r_[True, (v[1:] != v[:-1]) | (w[1:] != w[:-1])])
    cnt = np.diff(np.r_[starts, len(v)]).astype(np.int64)
    return v[starts], w[starts], cnt


def _orient_by_degree(lo, hi, dlo, dhi):
    """Orient each canonical edge from the smaller (degree, id) endpoint
    to the larger — the Suri-Vassilvitskii trick that bounds every
    node's out-degree by O(sqrt(m)), so wedge generation is O(m^1.5)
    total instead of sum(deg^2) on hub nodes."""
    swap = (dhi < dlo) | ((dhi == dlo) & (hi < lo))
    src = np.where(swap, hi, lo)
    dst = np.where(swap, lo, hi)
    ddst = np.where(swap, dlo, dhi)
    return src, dst, ddst


def _local_tri_block(block: pa.Table, max_wedges: int | None = None) -> pa.Table:
    """Single-task triangle count over one block of DISTINCT canonical
    edges: in-block degrees, degree orientation, wedge generation, and
    sorted-pair membership — the same algorithm the distributed path
    runs per partition.  `max_wedges` applies the same loud guard as
    the distributed path's per-partition check (a dense graph can sit
    under the edge-count fast-path cap while its wedge set is still
    O(m^1.5) ~ billions)."""
    if block.num_rows == 0:
        return pa.table(
            {
                "n_nodes": pa.array([0], pa.int64()),
                "n_edges": pa.array([0], pa.int64()),
                "n_triangles": pa.array([0], pa.int64()),
            }
        )
    lo = block["lo"].to_numpy(zero_copy_only=False)
    hi = block["hi"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes))
    dlo, dhi = deg[inv[: len(lo)]], deg[inv[len(lo):]]
    src, dst, ddst = _orient_by_degree(lo, hi, dlo, dhi)
    order = np.lexsort((dst, ddst, src))
    src_s, dst_s = src[order], dst[order]
    starts = _group_starts(src_s)
    if max_wedges is not None:
        ends = np.r_[starts[1:], len(src_s)]
        sizes = (ends - starts).astype(np.int64)
        n_wedges = int((sizes * (sizes - 1) // 2).sum())
        if n_wedges > max_wedges:
            raise RuntimeError(
                f"triangle_count: {n_wedges} wedges exceeds "
                f"max_block_wedges={max_wedges} on the single-task fast "
                "path — set local_cap=0 to force the distributed path"
            )
    wv, ww = _wedge_pairs(dst_s, starts)
    # membership: wedge (v, w) closed iff oriented edge v -> w exists
    tris = int(_pair_match_counts(src, dst, wv, ww, np.ones(len(wv), np.int64)))
    return pa.table(
        {
            "n_nodes": pa.array([len(nodes)], pa.int64()),
            "n_edges": pa.array([block.num_rows], pa.int64()),
            "n_triangles": pa.array([tris], pa.int64()),
        }
    )


def triangle_count(
    edges,
    a_col: str = "src",
    b_col: str = "dst",
    *,
    local_cap: int = 2_000_000,
    max_block_wedges: int = 200_000_000,
    num_partitions: int | None = None,
):
    """Global triangle census over an undirected graph given as an edge
    Dataset (a_col, b_col) — the classic web/link-graph statistic
    (clustering structure, spam-farm detection).

    The distributed path is the MapReduce algorithm of Suri &
    Vassilvitskii (WWW'11): canonical-dedup the edges (one pair-keyed
    shuffle), compute degrees (one node-keyed shuffle of edge-bounded
    partials), orient each edge from its smaller (degree, id) endpoint
    — bounding every out-neighborhood by O(sqrt(m)) — then generate
    wedges per center (one src-keyed shuffle; within-partition numpy
    segment pair generation, pre-counted per (v, w)) and close them
    against the oriented edge set (one pair-keyed shuffle).  Total
    work O(m^1.5), every stage a keyed shuffle of edge-bounded rows;
    no driver-side graph state.  Graphs under `local_cap` edges take a
    single-task fast path (same algorithm, one block), mirroring
    connected_components' hybrid.

    Degrees ride WITH the edges through the orientation stages (two
    co-partition passes) instead of a broadcast, so hub-heavy graphs
    with billions of nodes never materialize a driver/actor-side
    degree table.

    Output: one row (n_nodes, n_edges, n_triangles)."""

    def _canon(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_edges()
        a = batch[a_col].to_numpy(zero_copy_only=False)
        b = batch[b_col].to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = _uniq_edges(np.minimum(a, b), np.maximum(a, b))
        return _edge_table(lo, hi)

    def _dedup_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _empty_edges()
        lo, hi = _uniq_edges(
            block["lo"].to_numpy(zero_copy_only=False),
            block["hi"].to_numpy(zero_copy_only=False),
        )
        return _edge_table(lo, hi)

    e0 = edges.map_batches(_canon, batch_format="pyarrow")
    dedup_parts = num_partitions or _join_partitions()
    e = _groupby_key_blocks(
        e0,
        lambda b: _pair_key(
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False),
        ),
        _dedup_block,
        dedup_parts,
    ).materialize()
    n_edges = e.count()
    import ray

    if n_edges == 0:
        return ray.data.from_arrow(_local_tri_block(_empty_edges()))
    if n_edges <= local_cap:
        return e.repartition(1).map_batches(
            lambda b: _local_tri_block(b, max_block_wedges),
            batch_format="pyarrow",
            batch_size=None,
        )
    # partition count scales with the edge set (~100k edges each, up to
    # the repo-wide cap) so small graphs don't pay per-partition fixed
    # costs — the same sizing rule as connected_components
    if num_partitions is None:
        num_partitions = max(1, min(_join_partitions(), -(-n_edges // 100_000)))

    # -- degrees: edge-bounded partials -> one node-keyed groupby --------
    def _deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch["lo"].to_numpy(zero_copy_only=False),
                batch["hi"].to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(both, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()), "partial": pa.array(c, pa.int64())}
        )

    deg = (
        e.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node")
        .sum("partial")
        .map_batches(
            lambda b: pa.table({"node": b["node"], "deg": b["sum(partial)"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_nodes = deg.count()

    # -- attach deg(lo), deg(hi): two union-tagged co-partition passes ---
    def _attach(e_ds, key_col: str, carry: list[str], out_col: str):
        def _tag_edges(b: pa.Table) -> pa.Table:
            cols = {"k": b[key_col]}
            for c in ("lo", "hi", *carry):
                cols[c] = b[c]
            cols["d"] = pa.array(np.full(b.num_rows, -1, np.int64))
            return pa.table(cols)

        def _tag_deg(b: pa.Table) -> pa.Table:
            neg = pa.array(np.full(b.num_rows, -1, np.int64))
            cols = {"k": b["node"], "lo": neg, "hi": neg}
            for c in carry:
                cols[c] = neg
            cols["d"] = b["deg"]
            return pa.table(cols)

        tagged = e_ds.map_batches(_tag_edges, batch_format="pyarrow").union(
            deg.map_batches(_tag_deg, batch_format="pyarrow")
        )

        def _block(block: pa.Table) -> pa.Table:
            out_cols = ["lo", "hi", *carry, out_col]
            if block.num_rows == 0:
                return pa.table(
                    {c: pa.array([], pa.int64()) for c in out_cols}
                )
            d = block["d"].to_numpy(zero_copy_only=False)
            k = block["k"].to_numpy(zero_copy_only=False)
            is_deg = d >= 0
            nodes, degs = k[is_deg], d[is_deg]
            o = np.argsort(nodes, kind="stable")
            nodes, degs = nodes[o], degs[o]
            ek = k[~is_deg]
            idx = np.searchsorted(nodes, ek)
            if len(ek):
                if len(nodes) == 0:
                    raise RuntimeError(
                        "triangle_count: partition has edges but no degree rows"
                    )
                idx = np.minimum(idx, len(nodes) - 1)
                if (nodes[idx] != ek).any():
                    raise RuntimeError(
                        "triangle_count: endpoint missing from degree table"
                    )
            vals = {c: block[c].to_numpy(zero_copy_only=False)[~is_deg] for c in ("lo", "hi", *carry)}
            vals[out_col] = degs[idx]
            return pa.table({c: pa.array(vals[c], pa.int64()) for c in out_cols})

        return _groupby_key_blocks(
            tagged,
            lambda b: b["k"].to_numpy(zero_copy_only=False),
            _block,
            num_partitions,
        )

    with_dlo = _attach(e, "lo", [], "dlo")
    oriented_in = _attach(with_dlo, "hi", ["dlo"], "dhi")

    def _orient(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in ("src", "dst", "ddst")})
        src, dst, ddst = _orient_by_degree(
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False),
            b["dlo"].to_numpy(zero_copy_only=False),
            b["dhi"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "ddst": pa.array(ddst, pa.int64()),
            }
        )

    oriented = oriented_in.map_batches(_orient, batch_format="pyarrow").materialize()

    # -- wedges: per-center ordered pairs, pre-counted per (v, w) --------
    def _wedge_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in ("v", "w", "cnt")})
        src = block["src"].to_numpy(zero_copy_only=False)
        dst = block["dst"].to_numpy(zero_copy_only=False)
        ddst = block["ddst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, ddst, src))
        src_s, dst_s = src[order], dst[order]
        starts = _group_starts(src_s)
        ends = np.r_[starts[1:], len(src_s)]
        sizes = (ends - starts).astype(np.int64)
        n_wedges = int((sizes * (sizes - 1) // 2).sum())
        if n_wedges > max_block_wedges:
            raise RuntimeError(
                f"triangle_count: {n_wedges} wedges in one partition exceeds "
                f"max_block_wedges={max_block_wedges} — raise num_partitions "
                "(degree orientation bounds TOTAL wedges at O(m^1.5); a "
                "single partition this hot means extreme skew)"
            )
        wv, ww = _wedge_pairs(dst_s, starts)
        v, w, cnt = _count_pairs(wv, ww)
        return pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    wedges = _groupby_key_blocks(
        oriented,
        lambda b: b["src"].to_numpy(zero_copy_only=False),
        _wedge_block,
        num_partitions,
    )

    # -- close wedges against the oriented edge set ----------------------
    def _edge_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": b["src"],
                "w": b["dst"],
                "cnt": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    unioned = wedges.union(oriented.map_batches(_edge_rows, batch_format="pyarrow"))

    def _close_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"tri": pa.array([], pa.int64())})
        cnt = block["cnt"].to_numpy(zero_copy_only=False)
        v = block["v"].to_numpy(zero_copy_only=False)
        w = block["w"].to_numpy(zero_copy_only=False)
        is_edge = cnt < 0
        tri = _pair_match_counts(
            v[is_edge], w[is_edge], v[~is_edge], w[~is_edge], cnt[~is_edge]
        )
        return pa.table({"tri": pa.array([tri], pa.int64())})

    partials = _groupby_key_blocks(
        unioned,
        lambda b: _pair_key(
            b["v"].to_numpy(zero_copy_only=False),
            b["w"].to_numpy(zero_copy_only=False),
        ),
        _close_block,
        num_partitions,
    )
    tris = int(partials.sum("tri") or 0)

    return ray.data.from_arrow(
        pa.table(
            {
                "n_nodes": pa.array([n_nodes], pa.int64()),
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_triangles": pa.array([tris], pa.int64()),
            }
        )
    )


def hits_scores(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    broadcast_nodes_max: int = 5_000_000,
):
    """HITS hub/authority scores (Kleinberg 1999, "Authoritative sources
    in a hyperlinked environment") after a fixed number of unnormalized
    iterations — the link-analysis complement to PageRank for a search
    engine's domain graph (SURVEY G6 family).

    auth_k(v) = sum over u->v of hub_{k-1}(u); hub_k(u) = sum over u->v
    of auth_k(v); hub_0 = 1.  Skipping the per-iteration normalization
    keeps every score an EXACT int64 (the repo's oracle convention —
    float normalization is one driver-side division away); overflow is
    bounded UP FRONT from the max in/out degrees ((d_in*d_out)^k < 2^62
    or a loud error) so a wrapped sum can never masquerade as a result.

    Scale shape: one groupby-shuffle global-distincts the edge list and
    a second computes per-node (out, in) degrees — auth_1 IS the
    in-degree column, and the degree maxima give the overflow bound for
    free.  Each remaining half-iteration broadcasts the (node, score)
    table (ray.put once, searchsorted per edge batch — node tables are
    graph-sized, not corpus-sized) and reduces with one groupby; above
    broadcast_nodes_max it degrades to the hash_equi_join path instead
    of failing.  The exchange only ever moves the edge list.

    Output: (node, hub, auth) over every node of the graph, 0 where a
    node has no out-edges (hub) / in-edges (auth)."""
    from marginalia_ray.ops.relational import broadcast_join, hash_equi_join

    if iterations < 1:
        raise ValueError("hits_scores: iterations must be >= 1")

    def _dedup(batch: pa.Table) -> pa.Table:
        return (
            pa.table({src_col: batch[src_col], dst_col: batch[dst_col]})
            .group_by([src_col, dst_col])
            .aggregate([])
        )

    from marginalia_ray.ops.relational import bucketed_group_agg

    distinct = (
        bucketed_group_agg(
            edges.map_batches(_dedup, batch_format="pyarrow"),
            [src_col, dst_col], [], agg="count",
        )
        .drop_columns(["count()"])
        .materialize()
    )

    def _deg_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "o": pa.array([], pa.int64()),
                    "i": pa.array([], pa.int64()),
                }
            )
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        su, sc = np.unique(src, return_counts=True)
        du, dc = np.unique(dst, return_counts=True)
        return pa.table(
            {
                "node": pa.array(np.concatenate([su, du])),
                "o": pa.array(np.concatenate([sc, np.zeros(len(du), np.int64)])),
                "i": pa.array(np.concatenate([np.zeros(len(su), np.int64), dc])),
            }
        )

    degrees = (
        bucketed_group_agg(
            distinct.map_batches(_deg_partial, batch_format="pyarrow"),
            ["node"], ["o", "i"],
        )
        .materialize()
    )
    from ray.data.aggregate import Max

    maxes = degrees.aggregate(Max("sum(o)"), Max("sum(i)"))
    d_out = int(maxes.get("max(sum(o))") or 0)
    d_in = int(maxes.get("max(sum(i))") or 0)
    if d_out == 0:
        # no edges at all (every edge carries an out-degree): empty
        # result with the output schema, like triangle_count's guard
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "hub": pa.array([], pa.int64()),
                    "auth": pa.array([], pa.int64()),
                }
            )
        )
    if d_in and d_out and (d_in * d_out) ** iterations >= (1 << 62):
        raise RuntimeError(
            f"hits_scores: bound (d_in*d_out)^k = ({d_in}*{d_out})^"
            f"{iterations} would overflow int64 — normalize per iteration "
            "(float mode) or lower iterations"
        )

    # auth_1 = in-degree (hub_0 = 1): rides the degree shuffle for free
    def _auth1(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "node": batch["node"].cast(pa.int64()),
                "s": batch["sum(i)"].cast(pa.int64()),
            }
        )
        return t.filter(pc.greater(t["s"], 0))

    auth = degrees.map_batches(_auth1, batch_format="pyarrow")

    def _sum_partial(batch: pa.Table, key: str) -> pa.Table:
        t = pa.table({"node": batch[key], "s": batch["s"]})
        g = t.group_by("node").aggregate([("s", "sum")])
        return g.rename_columns(["node", "s"])

    def _strip(ds_):
        return ds_.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].cast(pa.int64()),
                    "s": b["sum(s)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    def _local_sum(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        nodes = block["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = block["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes, kind="stable")
        nodes, s = nodes[order], s[order]
        starts = np.flatnonzero(np.r_[True, nodes[1:] != nodes[:-1]])
        return pa.table(
            {
                "node": pa.array(nodes[starts]),
                "s": pa.array(np.add.reduceat(s, starts)),
            }
        )

    def _propagate(score_ds, join_key: str, group_key: str):
        """Score table joined onto the edges at join_key, summed per
        group_key — broadcast when the node table fits, hash join
        fallback above the cap.  On the broadcast path the reduce is a
        single-task local sum over the per-batch partials: the result
        table is <= broadcast_nodes_max rows BY CONSTRUCTION (the next
        half-iteration broadcasts it whole), so a full groupby barrier
        would pay an all-to-all's fixed cost to shuffle a table that one
        task folds in milliseconds."""
        try:
            j = broadcast_join(
                distinct,
                score_ds,
                on=join_key,
                small_on="node",
                small_cols=["s"],
                max_small_rows=broadcast_nodes_max,
            )
            partial = (
                j.map_batches(
                    lambda b: _sum_partial(b, group_key), batch_format="pyarrow"
                )
                .repartition(1)
                .map_batches(_local_sum, batch_format="pyarrow", batch_size=None)
            )
            return partial
        except RuntimeError:
            j = hash_equi_join(
                distinct,
                score_ds,
                on=join_key,
                right_on="node",
                left_cols=[src_col, dst_col],
                right_cols=["s"],
            )
        return _strip(
            bucketed_group_agg(
                j.map_batches(
                    lambda b: _sum_partial(b, group_key), batch_format="pyarrow"
                ),
                ["node"], ["s"],
            )
        )

    hub = _propagate(auth, dst_col, src_col)  # hub_1
    for _ in range(iterations - 1):
        auth = _propagate(hub, src_col, dst_col)
        hub = _propagate(auth, dst_col, src_col)

    # full outer merge over the node universe via a tagged union groupby:
    # (node, hub, 0) + (node, 0, auth) + (node, 0, 0) for every endpoint.
    def _tag(col: str):
        def _f(batch: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(batch.num_rows, np.int64))
            return pa.table(
                {
                    "node": batch["node"],
                    "hub": batch["s"] if col == "hub" else z,
                    "auth": batch["s"] if col == "auth" else z,
                }
            )

        return _f

    def _nodes(batch: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(batch.num_rows, np.int64))
        return pa.table(
            {"node": batch["node"].cast(pa.int64()), "hub": z, "auth": z}
        )

    union = (
        hub.map_batches(_tag("hub"), batch_format="pyarrow")
        .union(auth.map_batches(_tag("auth"), batch_format="pyarrow"))
        .union(degrees.map_batches(_nodes, batch_format="pyarrow"))
    )
    from marginalia_ray.ops.relational import bucketed_group_agg

    agg = bucketed_group_agg(union, ["node"], ["hub", "auth"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"].cast(pa.int64()),
                "hub": b["sum(hub)"].cast(pa.int64()),
                "auth": b["sum(auth)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
