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
from .dedup import _fmix64_vec as _fmix_u64
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

    # the (name, id) HashSet dedup and the final spec assembly share ONE
    # co-grouped barrier below: candidates are keyed by fmix(did) when the
    # id is known (same id -> same partition as its url aggregate) and by
    # the name hash for unknown queue names (-1 ids spread instead of
    # skewing one partition); dedup happens vectorized inside the merge
    n_buckets = 256
    cand = elig.union(queue_resolved)

    # per-domain url aggregation: top url_limit by (visited desc,
    # has_hash desc, url_id), natural-sorted, first_k head + count +
    # visited count.  ONE bucketed shuffle (same domain -> same bucket),
    # then fully VECTORIZED per-domain segments within each partition —
    # a per-domain map_groups here costs one Python task per domain,
    # which at 1e8 domains is the scheduler, not the work.
    def _uslim(batch: pa.Table) -> pa.Table:
        did = batch[id_col].cast(pa.int64())
        pk = (
            _fmix_u64(did.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).view(np.int64)
        return pa.table(
            {
                "domain_id": did,
                "url": batch["url"],
                "visited": batch["visited"].cast(pa.bool_()),
                "has_hash": batch["has_hash"].cast(pa.bool_()),
                "url_id": batch["url_id"].cast(pa.int64()),
                "_upk": pa.array(pk),
            }
        )

    def _url_part(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "did": pa.array([], pa.int64()),
                "url_count": pa.array([], pa.int64()),
                "first_urls": pa.array([], pa.string()),
                "visited_count": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        d = part["domain_id"].to_numpy(zero_copy_only=False)
        v = part["visited"].to_numpy(zero_copy_only=False).astype(bool)
        h = part["has_hash"].to_numpy(zero_copy_only=False).astype(bool)
        uid = part["url_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, ~h, ~v, d))
        d_s, v_s = d[order], v[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        seg_len = np.diff(np.r_[starts, len(d_s)])
        seg = np.repeat(np.arange(len(starts)), seg_len)
        pos = np.arange(len(d_s)) - starts[seg]
        keep = pos < url_limit
        dids = d_s[starts]
        url_count = np.bincount(seg[keep], minlength=len(starts))
        visited_count = np.bincount(seg, weights=v_s, minlength=len(starts))
        # natural-order head: re-sort the kept rows by (domain, url)
        urls_col = part["url"].take(pa.array(order[keep]))
        if isinstance(urls_col, pa.ChunkedArray):
            urls_col = urls_col.combine_chunks()
        urls_np = np.asarray(urls_col.to_pylist(), dtype=object)
        kd = d_s[keep]
        order2 = np.lexsort((urls_np, kd))
        kd2, u2 = kd[order2], urls_np[order2]
        starts2 = np.flatnonzero(np.r_[True, kd2[1:] != kd2[:-1]])
        seg2 = np.repeat(
            np.arange(len(starts2)), np.diff(np.r_[starts2, len(kd2)])
        )
        pos2 = np.arange(len(kd2)) - starts2[seg2]
        head = pos2 < first_k
        firsts: list[str] = []
        hseg, hurl = seg2[head], u2[head]
        j = 0
        for i in range(len(starts2)):
            parts_ = []
            while j < len(hseg) and hseg[j] == i:
                parts_.append(hurl[j])
                j += 1
            firsts.append(",".join(parts_))
        # starts2 segments are in the same domain order as starts (both
        # sorted by domain id)
        return pa.table(
            {
                "did": pa.array(dids.astype(np.int64)),
                "url_count": pa.array(url_count.astype(np.int64)),
                "first_urls": pa.array(firsts, pa.string()),
                "visited_count": pa.array(visited_count.astype(np.int64)),
            }
        )

    url_agg = (
        urls.map_batches(_uslim, batch_format="pyarrow")
        .groupby("_upk")
        .map_groups(_url_part, batch_format="pyarrow")
    )

    # --- merged barrier: dedup candidates + attach url aggregates -------
    def _union_schema(n: int) -> dict:
        return {
            "name": pa.nulls(n, pa.string()),
            "did": pa.nulls(n, pa.int64()),
            "url_count": pa.nulls(n, pa.int64()),
            "first_urls": pa.nulls(n, pa.string()),
            "visited_count": pa.nulls(n, pa.int64()),
        }

    def _tag_cand(batch: pa.Table) -> pa.Table:
        did = batch["did"].to_numpy(zero_copy_only=False).astype(np.int64)
        nh = _token_hash_arrow(batch["name"])
        key = np.where(
            did >= 0, _fmix_u64(did.astype(np.uint64)), nh
        ).astype(np.uint64)
        cols = _union_schema(len(did))
        cols["name"] = batch["name"]
        cols["did"] = pa.array(did)
        cols["_src"] = pa.array(np.zeros(len(did), np.int8))
        cols["_pk"] = pa.array((key % np.uint64(n_buckets)).view(np.int64))
        return pa.table(cols)

    def _tag_agg(batch: pa.Table) -> pa.Table:
        did = batch["did"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = _fmix_u64(did.astype(np.uint64))
        cols = _union_schema(len(did))
        cols["did"] = pa.array(did)
        cols["url_count"] = batch["url_count"].cast(pa.int64())
        cols["first_urls"] = batch["first_urls"]
        cols["visited_count"] = batch["visited_count"].cast(pa.int64())
        cols["_src"] = pa.array(np.ones(len(did), np.int8))
        cols["_pk"] = pa.array((key % np.uint64(n_buckets)).view(np.int64))
        return pa.table(cols)

    def _merge_part(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "domain_name": pa.array([], pa.string()),
                "domain_id": pa.array([], pa.int64()),
                "crawl_depth": pa.array([], pa.int64()),
                "url_count": pa.array([], pa.int64()),
                "first_urls": pa.array([], pa.string()),
            }
        )
        if part.num_rows == 0:
            return empty
        src = part["_src"].to_numpy(zero_copy_only=False)
        ci = np.flatnonzero(src == 0)
        if len(ci) == 0:
            return empty  # url aggregates with no surviving candidate
        # candidate dedup by (name, did): sort by (name-hash, did), verify
        # equal-hash runs are name-equal (loud on collision)
        cnames = part["name"].take(pa.array(ci))
        if isinstance(cnames, pa.ChunkedArray):
            cnames = cnames.combine_chunks()
        cdid = part["did"].to_numpy(zero_copy_only=False)[ci].astype(np.int64)
        nh = _token_hash_arrow(cnames)
        order = np.lexsort((cdid, nh))
        nh_s, did_s = nh[order], cdid[order]
        names_s = cnames.take(pa.array(order))
        if isinstance(names_s, pa.ChunkedArray):
            names_s = names_s.combine_chunks()
        same = np.r_[False, (nh_s[1:] == nh_s[:-1]) & (did_s[1:] == did_s[:-1])]
        if same.any():
            eq = pc.fill_null(
                pc.equal(names_s.slice(1), names_s.slice(0, len(names_s) - 1)),
                False,
            ).to_numpy(zero_copy_only=False)
            if (same[1:] & ~eq).any():
                raise ValueError(
                    "crawl_specs: (name,id) hash collision — widen the hash"
                )
        keep = ~same
        if len(bl):
            keep &= ~np.isin(did_s, bl)
        did_k = did_s[keep]
        names_k = names_s.filter(pa.array(keep))
        # url aggregates in this partition, sorted by did for searchsorted
        ai = np.flatnonzero(src == 1)
        adid = part["did"].to_numpy(zero_copy_only=False)[ai].astype(np.int64)
        aorder = np.argsort(adid)
        adid_s = adid[aorder]
        pos = np.searchsorted(adid_s, did_k)
        pos_c = np.minimum(pos, max(len(adid_s) - 1, 0))
        hit = (
            (adid_s[pos_c] == did_k) & (did_k >= 0)
            if len(adid_s)
            else np.zeros(len(did_k), bool)
        )
        take_agg = pa.array(ai[aorder][pos_c[hit]]) if hit.any() else None
        uc = np.zeros(len(did_k), np.int64)
        vc = np.zeros(len(did_k), np.int64)
        firsts = np.full(len(did_k), "", dtype=object)
        if take_agg is not None:
            uc[hit] = part["url_count"].take(take_agg).to_numpy(zero_copy_only=False)
            vc[hit] = part["visited_count"].take(take_agg).to_numpy(zero_copy_only=False)
            firsts[hit] = np.asarray(
                part["first_urls"].take(take_agg).to_pylist(), dtype=object
            )
        depth = np.minimum(
            np.where(vc < min_visit // 2, min_visit, vc + 1000 + vc // 4),
            max_visit,
        ).astype(np.int64)
        return pa.table(
            {
                "domain_name": names_k,
                "domain_id": pa.array(did_k),
                "crawl_depth": pa.array(depth),
                "url_count": pa.array(uc),
                "first_urls": pa.array(firsts.tolist(), pa.string()),
            }
        )

    return (
        cand.map_batches(_tag_cand, batch_format="pyarrow")
        .union(url_agg.map_batches(_tag_agg, batch_format="pyarrow"))
        .groupby("_pk")
        .map_groups(_merge_part, batch_format="pyarrow")
    )
