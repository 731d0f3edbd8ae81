"""Crawl-job spec extraction: the batch job that turns the domain/url
tables into per-domain crawling specifications.

Ports ``CrawlJobDomainExtractor`` (tools/crawl-job-extractor/src/main/
java/nu/marginalia/crawl/CrawlJobDomainExtractor.java:18-237):

  * candidate set = indexed ACTIVE domains **or EXHAUSTED domains
    regardless of INDEXED** — the reference SQL's unparenthesized
    ``WHERE INDEXED>0 AND STATE='ACTIVE' OR STATE='EXHAUSTED'``
    precedence quirk, kept as written — UNIONed with the crawl queue
    (unknown queue names get id -1), deduped as (name, id) pairs,
    id-blacklist filtered;
  * per-domain url list = top ``url_limit`` (25 000) urls by
    ``VISITED DESC, DATA_HASH IS NOT NULL DESC, ID``, then sorted in
    natural (lexicographic) order (``spec.urls.sort``);
  * crawl depth from the VISITED url count: fewer than
    ``min_visit / 2`` good documents keeps the shallow ``min_visit``
    (200), otherwise ``count + 1000 + count / 4`` (integer division),
    capped at ``max_visit`` (100 000);
  * spec id = Guava ``murmur3_128(0).hashUnencodedChars(name)`` hex
    (``crawl_spec_id`` below; UTF-16LE char hashing, little-endian hex
    rendering — pytest-checked, not part of the SQL-oracle row).

Ray shape (a real batch job over every domain): the candidate-vs-queue
name resolution is ONE keyed shuffle (hash_equi_join on the vectorized
64-bit name hash, left-outer; a cross-name hash collision raises loud
instead of mis-attributing an id), the url aggregation is one
groupby(domain) shuffle with a per-batch top-k combiner shape inside
``map_groups``, and the final depth/url attach is one more keyed join.
Blacklist is broadcast-small.  Output columns: (domain_name, domain_id,
crawl_depth, url_count, first_urls) where first_urls joins the first
``first_k`` naturally-sorted urls — the spec head, kept flat so the
DuckDB oracle can compare it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import murmur3_128
from .dedup import _token_hash_arrow
from .relational import hash_equi_join

MIN_VISIT_COUNT = 200
MAX_VISIT_COUNT = 100_000


def crawl_spec_id(domain_name: str) -> str:
    """CrawlJobDomainExtractor.createId: Guava murmur3_128(seed 0) over
    the UTF-16 chars, rendered as Guava's little-endian hex string."""
    h1, h2 = murmur3_128(domain_name.encode("utf-16-le"), seed=0)
    return (
        h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    ).hex()


def calculate_crawl_depth(
    visited_count: int,
    *,
    min_visit: int = MIN_VISIT_COUNT,
    max_visit: int = MAX_VISIT_COUNT,
) -> int:
    """calculateCrawlDepthFromVisitedCount (CrawlJobDomainExtractor.
    java:215-236)."""
    count = int(visited_count)
    if count < min_visit // 2:
        count = min_visit
    else:
        count = count + 1000 + count // 4
    return min(count, max_visit)


def crawl_specs(
    domains,
    urls,
    crawl_queue,
    *,
    blacklist=(),
    min_visit: int = MIN_VISIT_COUNT,
    max_visit: int = MAX_VISIT_COUNT,
    url_limit: int = 25_000,
    first_k: int = 5,
    active_state: int = 0,
    exhausted_state: int = 1,
    id_col: str = "domain_id",
    name_col: str = "domain_name",
    state_col: str = "state",
    indexed_col: str = "indexed",
):
    """extractDomainsFromQueue + createCrawlJobForDomain.

    ``domains``: (domain_id, domain_name, state, indexed);
    ``urls``: (domain_id, url, visited bool, has_hash bool, url_id);
    ``crawl_queue``: (domain_name).  Names are matched lowercased, as
    the reference SQL does.
    """
    bl = np.asarray(sorted(set(int(i) for i in blacklist)), dtype=np.int64)

    def _lower(col):
        import pyarrow.compute as pc

        return pc.utf8_lower(col)

    def _elig(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        st = batch[state_col].cast(pa.int64())
        ix = batch[indexed_col].cast(pa.int64())
        keep = pc.or_(
            pc.and_(pc.greater(ix, 0), pc.equal(st, active_state)),
            pc.equal(st, exhausted_state),
        )
        batch = batch.filter(pc.fill_null(keep, False))
        return pa.table(
            {
                "name": _lower(batch[name_col]),
                "did": batch[id_col].cast(pa.int64()),
            }
        )

    elig = domains.map_batches(_elig, batch_format="pyarrow")

    # queue names resolve against the domain table by hashed name (one
    # keyed shuffle); unknown names keep id -1 (IFNULL(ID, -1))
    def _qslim(batch: pa.Table) -> pa.Table:
        nm = _lower(batch[name_col])
        return pa.table(
            {"_qh": pa.array(_token_hash_arrow(nm).view(np.int64)), "qname": nm}
        )

    def _dslim(batch: pa.Table) -> pa.Table:
        nm = _lower(batch[name_col])
        return pa.table(
            {
                "_dh": pa.array(_token_hash_arrow(nm).view(np.int64)),
                "dname": nm,
                "did_r": batch[id_col].cast(pa.int64()),
            }
        )

    qjoin = hash_equi_join(
        crawl_queue.map_batches(_qslim, batch_format="pyarrow"),
        domains.map_batches(_dslim, batch_format="pyarrow"),
        on="_qh",
        right_on="_dh",
        left_cols=["_qh", "qname"],
        right_cols=["dname", "did_r"],
        how="left",
    )

    def _qresolve(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if isinstance(batch, pa.Table) and batch.num_rows == 0:
            return pa.table(
                {"name": pa.array([], pa.string()), "did": pa.array([], pa.int64())}
            )
        dn = batch["dname"]
        matched = (
            dn.combine_chunks().is_valid().to_numpy(zero_copy_only=False)
            if isinstance(dn, pa.ChunkedArray)
            else dn.is_valid().to_numpy(zero_copy_only=False)
        )
        eq = pc.fill_null(pc.equal(batch["qname"], dn), False).to_numpy(
            zero_copy_only=False
        )
        if (matched & ~eq).any():
            raise ValueError(
                "crawl_specs: 64-bit name-hash collision between distinct "
                "queue/domain names — widen the hash or dedupe upstream"
            )
        did = batch["did_r"].to_numpy(zero_copy_only=False)
        did = np.where(matched, np.nan_to_num(did, nan=-1), -1).astype(np.int64)
        return pa.table({"name": batch["qname"], "did": pa.array(did)})

    queue_resolved = qjoin.map_batches(_qresolve, batch_format="pyarrow")

    # (name, id) HashSet dedup across the union — one bucketed shuffle,
    # vectorized distinct within each partition (same pair -> same bucket)
    n_buckets = 256

    def _pair_key(batch: pa.Table) -> pa.Table:
        h = _token_hash_arrow(batch["name"])
        did = batch["did"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = (h ^ did.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(
            np.int64
        )
        return pa.table(
            {
                "name": batch["name"],
                "did": pa.array(did),
                "_h": pa.array(k),
                "_pk": pa.array((k.view(np.uint64) % np.uint64(n_buckets)).view(np.int64)),
            }
        )

    def _dedup_part(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {"name": pa.array([], pa.string()), "did": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        h = part["_h"].to_numpy(zero_copy_only=False)
        did = part["did"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, h))
        take = pa.array(order)
        h_s, did_s = h[order], did[order]
        names_s = part["name"].take(take)
        if isinstance(names_s, pa.ChunkedArray):
            names_s = names_s.combine_chunks()
        same = np.r_[False, (h_s[1:] == h_s[:-1]) & (did_s[1:] == did_s[:-1])]
        if same.any():
            # hash-equal runs must be name-equal too, else the pair hash
            # collided across distinct names — fail loud
            eq = pc.equal(names_s.slice(1), names_s.slice(0, len(names_s) - 1))
            eq = pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
            if (same[1:] & ~eq).any():
                raise ValueError(
                    "crawl_specs: (name,id) pair-hash collision — widen the hash"
                )
        keep = ~same
        if len(bl):
            keep &= ~np.isin(did_s, bl)
        m = pa.array(keep)
        return pa.table(
            {"name": names_s.filter(m), "did": pa.array(did_s[keep])}
        )

    cand = (
        elig.union(queue_resolved)
        .map_batches(_pair_key, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_dedup_part, batch_format="pyarrow")
    )

    # per-domain url aggregation: top url_limit by (visited desc,
    # has_hash desc, url_id), natural-sorted, first_k head + count +
    # visited count — one groupby(domain) shuffle
    def _url_group(group: pa.Table) -> pa.Table:
        did = int(group["domain_id"][0].as_py())
        visited = group["visited"].to_numpy(zero_copy_only=False).astype(bool)
        has_hash = group["has_hash"].to_numpy(zero_copy_only=False).astype(bool)
        uid = group["url_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, ~has_hash, ~visited))[:url_limit]
        sel_urls = sorted(
            group["url"].take(pa.array(order)).to_pylist()
        )  # spec.urls.sort(naturalOrder)
        return pa.table(
            {
                "did": pa.array([did], pa.int64()),
                "url_count": pa.array([len(sel_urls)], pa.int64()),
                "first_urls": pa.array(
                    [",".join(sel_urls[:first_k])], pa.string()
                ),
                "visited_count": pa.array([int(visited.sum())], pa.int64()),
            }
        )

    def _uslim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "domain_id": batch[id_col].cast(pa.int64()),
                "url": batch["url"],
                "visited": batch["visited"].cast(pa.bool_()),
                "has_hash": batch["has_hash"].cast(pa.bool_()),
                "url_id": batch["url_id"].cast(pa.int64()),
            }
        )

    url_agg = (
        urls.map_batches(_uslim, batch_format="pyarrow")
        .groupby("domain_id")
        .map_groups(_url_group, batch_format="pyarrow")
    )

    joined = hash_equi_join(
        cand,
        url_agg,
        on="did",
        right_cols=["url_count", "first_urls", "visited_count"],
        how="left",
    )

    def _final(batch: pa.Table) -> pa.Table:
        vc = batch["visited_count"].to_numpy(zero_copy_only=False)
        vc = np.nan_to_num(vc, nan=0.0).astype(np.int64)
        depth = np.minimum(
            np.where(vc < min_visit // 2, min_visit, vc + 1000 + vc // 4),
            max_visit,
        ).astype(np.int64)
        uc = np.nan_to_num(
            batch["url_count"].to_numpy(zero_copy_only=False), nan=0.0
        ).astype(np.int64)
        import pyarrow.compute as pc

        return pa.table(
            {
                "domain_name": batch["name"],
                "domain_id": batch["did"].cast(pa.int64()),
                "crawl_depth": pa.array(depth),
                "url_count": pa.array(uc),
                "first_urls": pc.fill_null(batch["first_urls"], ""),
            }
        )

    return joined.map_batches(_final, batch_format="pyarrow")
