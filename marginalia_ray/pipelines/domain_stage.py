"""Per-domain converter operations (groupby(domain).map_groups stage):
LSH near-duplicate removal (D3) — the domain-local half of
DomainProcessor.process.

Reference semantics (LshDocumentDeduplicator.java:24-63): for each fully
processed document, scanning in order, remove any OTHER good document that
(a) both have >= 100 words, (b) LSH hamming distance <= 2, and (c) has a
path no shorter than this one's (shorter path wins).  Removed docs keep
their row with state DISQUALIFIED/"Duplicate" and no postings (the
converter's disqualified-not-dropped convention, DocumentProcessor.java:52).

Partitioning assumption: one domain's documents fit in one group — true by
construction (domains are crawl units in the reference; a pathological
mega-domain would be capped upstream at crawl time).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from marginalia_ray.model.codecs import U64


def _path_len(url: str) -> int:
    # EdgeUrl.path length: everything after the authority
    i = url.find("://")
    j = url.find("/", i + 3 if i >= 0 else 0)
    return len(url) - j if j >= 0 else 1


def dedup_domain_group(group: pa.Table) -> pa.Table:
    """One domain's journal rows -> same rows with duplicates disqualified."""
    states = group["state"].to_pylist()
    lshs = group["lsh"].to_numpy(zero_copy_only=False).astype(U64)
    lengths = group["length"].to_numpy(zero_copy_only=False)
    urls = group["url"].to_pylist()

    n = len(states)
    good = [i for i in range(n) if states[i] == "OK"]
    alive = set(good)
    plen = [_path_len(u) for u in urls]

    for i in range(n):
        if i not in alive or states[i] != "OK":
            continue
        if lengths[i] < 100:
            continue
        for j in list(alive):
            if j == i or lengths[j] < 100:
                continue
            x = int(lshs[i] ^ lshs[j])
            if bin(x).count("1") > 2:
                continue
            if plen[i] < plen[j]:
                alive.discard(j)

    dead = [i for i in good if i not in alive]
    if not dead:
        return group

    new_state = list(states)
    empty_u64_list: list = []
    th = group["term_hashes"].to_pylist()
    km = group["kw_metas"].to_pylist()
    for i in dead:
        new_state[i] = "DISQUALIFIED_DUPLICATE"
        th[i] = empty_u64_list
        km[i] = empty_u64_list

    cols = {}
    for name in group.column_names:
        if name == "state":
            cols[name] = pa.array(new_state, pa.string())
        elif name == "term_hashes":
            cols[name] = pa.array(th, pa.list_(pa.uint64()))
        elif name == "kw_metas":
            cols[name] = pa.array(km, pa.list_(pa.uint64()))
        else:
            cols[name] = group[name]
    return pa.table(cols)


def apply_domain_stage(journal_ds):
    """journal -> journal with per-domain dedup applied.  One groupby
    shuffle keyed on the domain part of doc_id."""
    import pyarrow.compute as pc

    def add_domain(batch: pa.Table) -> pa.Table:
        dom = pc.shift_right(batch["doc_id"], 32)
        return batch.append_column("_domain", pc.cast(dom, pa.int64()))

    out = (
        journal_ds.map_batches(add_domain, batch_format="pyarrow")
        .groupby("_domain")
        .map_groups(dedup_domain_group, batch_format="pyarrow")
    )
    return out.drop_columns(["_domain"])
