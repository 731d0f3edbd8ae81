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


def _domain_of_url(url: str) -> str:
    i = url.find("://")
    j = url.find("/", i + 3 if i >= 0 else 0)
    host = url[i + 3 : j] if j >= 0 else url[i + 3 :]
    return host.lower()


def dedup_recrawls_domain_group(group: pa.Table) -> pa.Table:
    """Keep one row per URL (the reference's loader keys by url and
    overwrites, so only one copy of a url's postings reaches the index;
    first row in group order wins), then resolve url_id hash collisions:
    two DISTINCT urls whose murmur32(url) low bits collide (possible
    because our url ids are hashes, where the reference uses DB-assigned
    EC_URL ids — LoaderIndexJournalWriter keys on the DB id) get
    deterministically re-probed low-32 ids so the forward index's
    keep-first dedup can never silently drop a distinct url.

    Determinism: collision sets are processed in ascending doc_id order,
    the lexicographically smallest url keeps the original hash, and the
    rest probe +1, +2, ... (mod 2^32) against the set of ids already used
    in this domain — a pure function of the domain's url set."""
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    urls = group["url"].to_pylist()
    n = len(ids)

    seen_urls: set[str] = set()
    keep = np.ones(n, dtype=bool)
    for i, u in enumerate(urls):
        if u in seen_urls:
            keep[i] = False
        else:
            seen_urls.add(u)

    kept_idx = np.flatnonzero(keep)
    by_id: dict[int, list[int]] = {}
    for i in kept_idx:
        by_id.setdefault(int(ids[i]), []).append(int(i))

    new_ids: np.ndarray | None = None
    if any(len(v) > 1 for v in by_id.values()):
        used = set(by_id.keys())
        new_ids = ids.astype(U64).copy()
        for did in sorted(k for k, v in by_id.items() if len(v) > 1):
            rows = sorted(by_id[did], key=lambda i: urls[i])
            high = did & ~0xFFFF_FFFF
            for r in rows[1:]:  # smallest url keeps the original hash
                low = did & 0xFFFF_FFFF
                while True:
                    low = (low + 1) & 0xFFFF_FFFF
                    cand = high | low
                    if cand not in used:
                        break
                used.add(cand)
                new_ids[r] = cand

    if keep.all() and new_ids is None:
        return group
    if new_ids is not None:
        cols = {}
        for name in group.schema.names:
            if name == "doc_id":
                cols[name] = pa.array(new_ids, pa.uint64())
            else:
                cols[name] = group[name]
        group = pa.table(cols)
    if keep.all():
        return group
    return group.filter(pa.array(keep))


def fix_canonicals_domain_group(group: pa.Table) -> pa.Table:
    """fixBadCanonicalTags (DomainProcessor.java:95-147) + canonical dedup
    (M24/D4) for one domain's journal rows.

    Repair passes, in reference order:
      1. collect canonical -> {body hashes} for docs whose canonical
         differs from their url, and the set of crawled urls;
      2. a canonical shared by >1 distinct content hash is a "blanket"
         canonical: the first doc claiming an UNCRAWLED target resets its
         canonical to its own url and reserves the target (seenUrls.add
         semantics); later claimants — and claimants of crawled targets —
         are marked BAD_CANONICAL;
      3. remaining blanket canonicals reset to the doc's own url;
      4. cross-domain canonicals reset to the doc's own url.

    Dedup (the loader keys docs by canonical url, DocumentProcessor
    .java:102-112): a surviving doc whose canonical points at ANOTHER
    crawled url duplicates that page — disqualified; a canonical pointing
    at an uncrawled url re-keys the doc (doc_id low 32 bits become the
    canonical's url hash)."""
    if "canonical" not in group.column_names:
        return group
    urls = group["url"].to_pylist()
    canon = group["canonical"].to_pylist()
    hashes = (
        group["body_hash"].to_numpy(zero_copy_only=False)
        if "body_hash" in group.column_names
        else np.zeros(len(urls), dtype=U64)
    )
    states = group["state"].to_pylist()
    n = len(urls)

    seen_canon: dict[str, set[int]] = {}
    seen_urls = set(urls)
    for i in range(n):
        c = canon[i]
        if c and c != urls[i]:
            seen_canon.setdefault(c, set()).add(int(hashes[i]))

    new_state = list(states)
    for i in range(n):
        c = canon[i]
        if c and c != urls[i] and len(seen_canon.get(c, ())) > 1:
            if c not in seen_urls:
                seen_urls.add(c)
                canon[i] = urls[i]
            else:
                new_state[i] = "BAD_CANONICAL"
    for i in range(n):
        c = canon[i]
        if c and c != urls[i] and len(seen_canon.get(c, ())) > 1:
            canon[i] = urls[i]
    for i in range(n):
        c = canon[i]
        if c and _domain_of_url(c) != _domain_of_url(urls[i]):
            canon[i] = urls[i]

    # dedup / re-key
    from marginalia_ray.functions.hashing import murmur3_64

    crawled = set(urls)
    claimed: set[str] = set()  # uncrawled targets already re-keyed to
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(U64).copy()
    new_urls = list(urls)
    # re-keyed ids must not collide with any id already used in this
    # domain (incl. earlier re-keys): same deterministic +1 probe as
    # dedup_recrawls_domain_group, else the forward index's keep-first
    # would silently drop a distinct doc
    used_ids = {int(d) for d in doc_ids}
    for i in range(n):
        c = canon[i]
        if new_state[i] != "OK" or not c or c == urls[i]:
            continue
        if c in crawled or c in claimed:
            # content lives at (or was already re-keyed to) the target
            new_state[i] = "DISQUALIFIED_CANONICAL"
        else:
            claimed.add(c)
            high = int(doc_ids[i]) & ~0xFFFF_FFFF
            low = murmur3_64(c.encode("utf-8")) & 0xFFFF_FFFF
            cand = high | low
            while cand in used_ids:
                low = (low + 1) & 0xFFFF_FFFF
                cand = high | low
            used_ids.add(cand)
            doc_ids[i] = U64(cand)
            new_urls[i] = c

    if (
        new_state == states
        and new_urls == urls
        and canon == group["canonical"].to_pylist()
        and (doc_ids == group["doc_id"].to_numpy(zero_copy_only=False).astype(U64)).all()
    ):
        return group

    th = group["term_hashes"].to_pylist()
    km = group["kw_metas"].to_pylist()
    for i in range(n):
        if new_state[i] in ("BAD_CANONICAL", "DISQUALIFIED_CANONICAL"):
            th[i] = []
            km[i] = []
    cols = {}
    for name in group.column_names:
        if name == "state":
            cols[name] = pa.array(new_state, pa.string())
        elif name == "doc_id":
            cols[name] = pa.array(doc_ids, pa.uint64())
        elif name == "url":
            cols[name] = pa.array(new_urls, pa.string())
        elif name == "canonical":
            cols[name] = pa.array(canon, pa.string())
        elif name == "term_hashes":
            cols[name] = pa.array(th, pa.list_(pa.uint64()))
        elif name == "kw_metas":
            cols[name] = pa.array(km, pa.list_(pa.uint64()))
        else:
            cols[name] = group[name]
    return pa.table(cols)


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

    # pigeonhole prefilter (mega-domain guard): hamming <= 2 over 64 bits
    # means at least one of three ~21-bit chunks is equal, so candidate
    # pairs come from shared chunk buckets instead of the O(n^2) scan.
    # Outcome is identical — the full hamming test still gates removal.
    buckets: list[dict[int, list[int]]] = [{}, {}, {}]
    shifts = (np.uint64(0), np.uint64(22), np.uint64(43))
    masks = (np.uint64((1 << 22) - 1), np.uint64((1 << 21) - 1), np.uint64((1 << 21) - 1))
    for i in good:
        if lengths[i] < 100:
            continue
        v = lshs[i]
        for k in range(3):
            buckets[k].setdefault(int((v >> shifts[k]) & masks[k]), []).append(i)

    for i in range(n):
        if i not in alive or states[i] != "OK":
            continue
        if lengths[i] < 100:
            continue
        v = lshs[i]
        cands: set[int] = set()
        for k in range(3):
            cands.update(buckets[k].get(int((v >> shifts[k]) & masks[k]), ()))
        for j in cands:
            if j == i or j not in alive or lengths[j] < 100:
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


# ---- SiteWords (J7): common site words + link-adjacent words ----------

MIN_REQUIRED_DOCUMENTS = 25
REQUIRED_TOTAL_COUNT = 15
QUALIFYING_PROPORTION = 0.25
MAX_SITE_KEYWORDS = 5
ADJACENT_MIN_COUNT = 3  # "> 3" in getAdjacentWords


def _common_site_words(flag_words_per_doc: list[list[str]]) -> set[str]:
    """CommonKeywordExtractor.getCommonSiteWords over one flag class's word
    lists (ref CommonKeywordExtractor.java:19-70)."""
    from marginalia_ray.functions.stemmer import stem

    docs = [ws for ws in flag_words_per_doc]
    if len(docs) < MIN_REQUIRED_DOCUMENTS:
        return set()
    counts: dict[str, int] = {}
    variants: dict[str, set[str]] = {}
    total = 0
    for ws in docs:
        for w in ws:
            st = stem(w)
            counts[st] = counts.get(st, 0) + 1
            variants.setdefault(st, set()).add(w)
            total += 1
    if total < REQUIRED_TOTAL_COUNT:
        return set()
    qualifying = len(docs) * QUALIFYING_PROPORTION
    top = sorted(
        (st for st, c in counts.items() if c > qualifying),
        key=lambda st: -counts[st],
    )[:MAX_SITE_KEYWORDS]
    out: set[str] = set()
    for st in top:
        out |= variants[st]
    return out


def _apply_flag_words(
    th: list[list[int]], km: list[list[int]], doc_idx: int,
    words: set[str], flag_bit: int,
) -> None:
    """DocumentKeywordsBuilder.setFlagOnMetadataForWords: OR the flag into
    existing entries, insert flag-only entries for missing words (hash is
    term identity)."""
    from marginalia_ray.functions.hashing import term_hash

    hashes = th[doc_idx]
    metas = km[doc_idx]
    pos = {h: i for i, h in enumerate(hashes)}
    for w in words:
        h = term_hash(w)
        if h is None:
            continue
        i = pos.get(h)
        if i is None:
            hashes.append(h)
            metas.append(flag_bit)
        else:
            metas[i] = metas[i] | flag_bit


def site_words_domain_group(group: pa.Table) -> pa.Table:
    """SiteWords.flagCommonSiteWords + flagAdjacentWords for one domain
    (ref SiteWords.java:24-74).  Mutates kw_metas; returns the group."""
    from marginalia_ray.model.codecs import WordFlags

    states = group["state"].to_pylist()
    urls = group["url"].to_pylist()
    links = group["links"].to_pylist() if "links" in group.column_names else [[] for _ in urls]
    flag_words = (
        group["flag_words"].to_pylist() if "flag_words" in group.column_names else [[] for _ in urls]
    )
    top_words = (
        group["top_words"].to_pylist() if "top_words" in group.column_names else [[] for _ in urls]
    )
    th = group["term_hashes"].to_pylist()
    km = group["kw_metas"].to_pylist()

    ok = [i for i, s in enumerate(states) if s == "OK"]

    # common site words -> Site flag on every doc
    common = _common_site_words([flag_words[i] or [] for i in ok])
    if common:
        for i in ok:
            _apply_flag_words(th, km, i, common, WordFlags.Site.bit)

    # adjacent words: inverted intra-domain link graph; keywords of linking
    # docs seen >3 times that the target itself ranks highly -> SiteAdjacent
    url_idx = {u: i for i, u in enumerate(urls)}
    incoming: dict[int, list[int]] = {}
    for i in ok:
        for l in links[i] or []:
            j = url_idx.get(l)
            if j is not None and j != i:
                incoming.setdefault(j, []).append(i)
    for j, srcs in incoming.items():
        if states[j] != "OK":
            continue
        counts: dict[str, int] = {}
        for i in srcs:
            for w in top_words[i] or []:
                counts[w] = counts.get(w, 0) + 1
        own = set(top_words[j] or [])
        adj = {w for w, c in counts.items() if c > ADJACENT_MIN_COUNT and w in own}
        if adj:
            _apply_flag_words(th, km, j, adj, WordFlags.SiteAdjacent.bit)

    cols = {}
    for name in group.column_names:
        if name == "term_hashes":
            cols[name] = pa.array(th, pa.list_(pa.uint64()))
        elif name == "kw_metas":
            cols[name] = pa.array(km, pa.list_(pa.uint64()))
        else:
            cols[name] = group[name]
    return pa.table(cols)


def domain_group_ops(group: pa.Table) -> pa.Table:
    """The full per-domain stage: re-crawl dedup, canonical repair + dedup
    (M24/D4), LSH dedup (D3), then site words (J7) — the
    DomainProcessor.process order (fixBadCanonicalTags runs before per-doc
    processing/dedup)."""
    return site_words_domain_group(
        dedup_domain_group(
            fix_canonicals_domain_group(dedup_recrawls_domain_group(group))
        )
    )


def apply_domain_stage(journal_ds, site_words: bool = True):
    """journal -> journal with per-domain ops applied.  One groupby
    shuffle keyed on the domain part of doc_id."""
    import pyarrow.compute as pc

    def add_domain(batch: pa.Table) -> pa.Table:
        dom = pc.shift_right(batch["doc_id"], 32)
        return batch.append_column("_domain", pc.cast(dom, pa.int64()))

    fn = domain_group_ops if site_words else dedup_domain_group
    out = (
        journal_ds.map_batches(add_domain, batch_format="pyarrow")
        .groupby("_domain")
        .map_groups(fn, batch_format="pyarrow")
    )
    return out.drop_columns(["_domain"])
