"""Ray-Data-native inverted + forward index construction.

Replaces the reference's three sequential single-threaded converter passes
(/root/reference/code/services-core/index-service/.../IndexServicesFactory.java:102-158,
 ReverseIndexFullConverter.java:52-135, ForwardIndexConverter.java:43-105)
with ONE Dataset shuffle:

    journal (doc_id, doc_meta, term_hashes, kw_metas)
      └─ map_batches: rank-encode doc ids (broadcast DomainRankings, J2),
         explode to flat postings, key by (term shard, doc-range bucket)
      └─ groupby(key).map_groups: lexsort (term, doc) and write one
         posting run per group — full index (with meta) and the priority
         subset (HIGH_PRIORITY_FLAGS filter, ReverseIndexPriorityParameters
         .java:14-28) in the same pass, halving the shuffle volume
      └─ forward index written directly from the journal (no shuffle)

Skew: a Zipf-head term's postings split across `n_buckets` doc-range groups
(the "salt"); because buckets are monotone in doc id the final per-term lists
are the concatenation of the runs — no merge pass, byte-deterministic for any
bucket count (tested).
"""

from __future__ import annotations

import time
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from marginalia_ray.model.codecs import (
    DEFAULT_DOMAIN_RANK,
    HIGH_PRIORITY_FLAGS,
    U64,
    doc_meta_encode_rank,
    domain_id_of,
    rank_encode_id,
    url_id_of,
)
from marginalia_ray.index.segment import bucket_of, write_manifest, write_run

JOURNAL_MAX_KEYWORDS = 1000  # IndexJournalEntryData.MAX_LENGTH — entry chunking cap


def _rank_lookup(domain_ids: np.ndarray, rankings: dict[int, int] | None) -> np.ndarray:
    if not rankings:
        return np.full(len(domain_ids), DEFAULT_DOMAIN_RANK, dtype=U64)
    keys = np.fromiter(rankings.keys(), dtype=np.int64)
    vals = np.fromiter(rankings.values(), dtype=np.int64)
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    idx = np.searchsorted(keys, domain_ids.astype(np.int64))
    idx = np.minimum(idx, len(keys) - 1)
    hit = keys[idx] == domain_ids.astype(np.int64)
    return np.where(hit, vals[idx], DEFAULT_DOMAIN_RANK).astype(U64)


def make_explode_fn(rankings_ref, n_shards: int, n_buckets: int,
                    boundaries: np.ndarray | None):
    """Stateless map_batches fn: journal rows -> flat keyed postings.
    `boundaries` (n_buckets-1 sorted uint64 split points, or None) is small
    and captured in the closure — shipped once per task, not per batch."""

    def explode(batch: pa.Table) -> pa.Table:
        rankings = ray.get(rankings_ref) if rankings_ref is not None else None
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(U64)
        kw_col = batch["term_hashes"].combine_chunks() if isinstance(batch["term_hashes"], pa.ChunkedArray) else batch["term_hashes"]
        meta_col = batch["kw_metas"].combine_chunks() if isinstance(batch["kw_metas"], pa.ChunkedArray) else batch["kw_metas"]

        parents = pc.list_parent_indices(kw_col).to_numpy()
        terms = pc.list_flatten(kw_col).to_numpy().astype(U64)
        metas = pc.list_flatten(meta_col).to_numpy().astype(U64)

        domains = domain_id_of(doc_ids)
        ranks = _rank_lookup(domains, rankings)
        enc_ids = rank_encode_id(doc_ids, ranks)[parents]

        shard = (terms % U64(n_shards)).astype(np.int64)
        bucket = bucket_of(enc_ids, boundaries)
        key = shard * n_buckets + bucket
        return pa.table(
            {
                "key": pa.array(key),
                "term_hash": pa.array(terms, type=pa.uint64()),
                "enc_doc_id": pa.array(enc_ids, type=pa.uint64()),
                "kw_meta": pa.array(metas, type=pa.uint64()),
            }
        )

    return explode


def make_run_writer(build_dir: str, n_buckets: int):
    """map_groups fn: one (shard,bucket) group -> segment run files on disk,
    returns lineage rows."""

    def write_group(group: pa.Table) -> pa.Table:
        key = int(group["key"][0].as_py())
        shard, bucket = divmod(key, n_buckets)
        terms = group["term_hash"].to_numpy().astype(U64)
        ids = group["enc_doc_id"].to_numpy().astype(U64)
        metas = group["kw_meta"].to_numpy().astype(U64)

        order = np.lexsort((ids, terms))
        terms, ids, metas = terms[order], ids[order], metas[order]

        # dedup (term, doc) pairs — the reference journal may carry a doc's
        # keyword twice only via chunked entries; keep the first meta.
        if len(terms):
            keep = np.empty(len(terms), dtype=bool)
            keep[0] = True
            keep[1:] = (terms[1:] != terms[:-1]) | (ids[1:] != ids[:-1])
            terms, ids, metas = terms[keep], ids[keep], metas[keep]

        rows = [write_run(build_dir, "full", shard, bucket, terms, ids, metas)]

        prio_mask = (metas & U64(HIGH_PRIORITY_FLAGS)) != 0
        rows.append(
            write_run(
                build_dir, "prio", shard, bucket, terms[prio_mask], ids[prio_mask], None
            )
        )
        return pa.Table.from_pylist(rows)

    return write_group


TARGET_RUN_POSTINGS = 2_000_000  # max postings a single (shard,bucket) group
# should hold: one group must sort+encode in one task's memory


def estimate_max_doc_freq(
    journal: "ray.data.Dataset", n_shards: int, sample_rate: int = 1
) -> int:
    """Doc-frequency sketch pass (SURVEY.md §4 skew row): per-batch partial
    term counts -> groupby(term).sum -> max.  Drives the bucket count so a
    Zipf-head term's postings split into bounded runs.

    sample_rate > 1 sketches a deterministic hash-mod row sample and scales
    the max back up — hot terms (the only ones that matter here) appear in
    ~df/rate sampled docs, so the estimate concentrates."""
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        if sample_rate > 1:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(U64)
            keep = (ids * U64(0x9E3779B97F4A7C15)) % U64(sample_rate) == 0
            batch = batch.filter(pa.array(keep))
        kw = batch["term_hashes"]
        if isinstance(kw, pa.ChunkedArray):
            kw = kw.combine_chunks()
        flat = pc.list_flatten(kw)
        t = pa.table({"term": flat}).group_by("term").aggregate([("term", "count")])
        return t.rename_columns(["term", "partial"])

    cols = ["term_hashes"] if sample_rate <= 1 else ["doc_id", "term_hashes"]
    counts = (
        journal.select_columns(cols)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("partial")
    )
    agg = counts.max("sum(partial)")
    return int(agg or 0) * sample_rate


def choose_buckets(journal: "ray.data.Dataset", n_shards: int,
                   target: int = TARGET_RUN_POSTINGS,
                   n_docs: int | None = None) -> int:
    """Pick the doc-range salt S from the doc-frequency sketch: the hottest
    term's postings split into ~ceil(max_df / target) monotone runs.

    Cheap gate first: max_df <= n_docs, so when the corpus has fewer docs
    than the per-run target the sketch pass is skipped entirely (this keeps
    small/medium builds at one pass; the sketch only runs at the scale
    where it pays for itself, and then over a row sample)."""
    if n_docs is None:
        n_docs = journal.count()
    if n_docs <= target:
        return 1
    # sample so a target-sized term still gets ~>=100 sampled hits
    rate = max(1, min(n_docs // 1_000_000, target // 100))
    max_df = estimate_max_doc_freq(journal, n_shards, sample_rate=rate)
    return max(1, -(-max_df // target))


BOUNDARY_SAMPLE_TARGET = 65_536  # enc-id sample size for quantile boundaries


def sample_bucket_boundaries(
    journal: "ray.data.Dataset",
    rankings_ref,
    n_buckets: int,
    n_docs: int,
    sample_target: int = BOUNDARY_SAMPLE_TARGET,
) -> np.ndarray | None:
    """Quantile split points over the rank-encoded doc-id space.

    One light pass over the doc_id column only: a deterministic hash-mod
    sample (~sample_target ids regardless of corpus size) comes to the
    driver; its n_buckets-1 quantiles become the bucket boundaries.  ~50
    samples per bucket bounds the bucket-size error to a few percent, which
    is all the TARGET_RUN_POSTINGS memory bound needs."""
    if n_buckets <= 1:
        return None
    rate = max(1, n_docs // sample_target)

    def _sample(batch: pa.Table) -> pa.Table:
        rankings = ray.get(rankings_ref) if rankings_ref is not None else None
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(U64)
        if rate > 1:
            ids = ids[(ids * U64(0x9E3779B97F4A7C15)) % U64(rate) == 0]
        domains = domain_id_of(ids)
        ranks = _rank_lookup(domains, rankings)
        enc = rank_encode_id(ids, ranks)
        return pa.table({"enc": pa.array(enc, type=pa.uint64())})

    sampled = journal.select_columns(["doc_id"]).map_batches(
        _sample, batch_format="pyarrow"
    )
    parts = [b["enc"].to_numpy() for b in sampled.iter_batches(batch_format="pyarrow")]
    enc = np.concatenate(parts) if parts else np.zeros(0, dtype=U64)
    if len(enc) == 0:
        return None
    enc.sort()
    idx = (np.arange(1, n_buckets) * len(enc)) // n_buckets
    bounds = np.unique(enc[idx])  # dup quantiles collapse (fewer buckets, fine)
    return bounds if len(bounds) else None


def build_index(
    journal: "ray.data.Dataset",
    build_dir: str | Path,
    *,
    n_shards: int = 32,
    n_buckets: int | str = "auto",
    domain_rankings: dict[int, int] | None = None,
) -> dict:
    """journal columns: doc_id(uint64), doc_meta(uint64),
    term_hashes(list<uint64>), kw_metas(list<uint64>).

    n_buckets='auto' (the default) sizes the doc-range salt from a
    doc-frequency sketch pass so no (shard,bucket) group exceeds
    TARGET_RUN_POSTINGS even under Zipfian term skew.

    Returns the build manifest (also written to MANIFEST.json)."""
    build_dir = str(build_dir)
    # Re-running into an existing build_dir must not accumulate stale
    # forward parquet / bucket run files (duplicate doc counts, duplicate
    # postings if the bucket count changed): clear the output subtrees.
    import shutil

    for sub in ("forward", "full", "prio"):
        shutil.rmtree(Path(build_dir) / sub, ignore_errors=True)
    Path(build_dir).mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    n_docs_est = journal.count()  # parquet metadata when untransformed
    if n_buckets == "auto":
        n_buckets = choose_buckets(journal, n_shards, n_docs=n_docs_est)
    n_buckets = max(1, int(n_buckets))

    rankings_ref = ray.put(domain_rankings) if domain_rankings else None
    boundaries = sample_bucket_boundaries(journal, rankings_ref, n_buckets, n_docs_est)
    n_buckets = (len(boundaries) + 1) if boundaries is not None else 1

    # --- forward index (ForwardIndexConverter semantics: rank folded into
    # doc_meta, domain id alongside; no shuffle, streaming write) ---
    def forward_batch(batch: pa.Table) -> pa.Table:
        rankings = ray.get(rankings_ref) if rankings_ref is not None else None
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(U64)
        doc_metas = batch["doc_meta"].to_numpy(zero_copy_only=False).astype(U64)
        domains = domain_id_of(doc_ids)
        ranks = _rank_lookup(domains, rankings)
        metas = doc_meta_encode_rank(doc_metas, ranks)
        return pa.table(
            {
                "url_id": pa.array(url_id_of(doc_ids).astype(np.int64)),
                "doc_meta": pa.array(metas, type=pa.uint64()),
                "domain_id": pa.array(domains.astype(np.int64)),
            }
        )

    fwd_dir = Path(build_dir) / "forward"
    fwd_dir.mkdir(parents=True, exist_ok=True)
    journal.map_batches(forward_batch, batch_format="pyarrow").write_parquet(str(fwd_dir))
    doc_count = sum(
        pa.parquet.ParquetFile(f).metadata.num_rows for f in fwd_dir.glob("*.parquet")
    )

    # --- posting runs: the one shuffle ---
    exploded = journal.select_columns(["doc_id", "term_hashes", "kw_metas"]).map_batches(
        make_explode_fn(rankings_ref, n_shards, n_buckets, boundaries),
        batch_format="pyarrow",
    )
    # sort-based shuffle (Ray's default) with an explicit partition count.
    # Measured against ShuffleStrategy.HASH_SHUFFLE on this box: hash is
    # 6-9x SLOWER (48-78s vs 8.3s for the 58k-doc build) because it spawns
    # one aggregator actor per partition — 128 actors on 32 cpus; keep the
    # default unless partitions ~= cores.  Partition-count floor scales
    # with corpus size (~1 partition per 250k docs) so a 100-TB run is not
    # squeezed through 128 shuffle partitions; the (shard*bucket) group
    # count stays the upper bound — more partitions than groups would only
    # create empty work.
    size_parts = max(128, n_docs_est // 250_000)
    n_parts = min(n_shards * max(1, n_buckets), size_parts)
    lineage_ds = exploded.groupby("key", num_partitions=n_parts).map_groups(
        make_run_writer(build_dir, n_buckets), batch_format="pyarrow"
    )
    lineage = lineage_ds.to_pandas()  # small: 2 rows per (shard,bucket)

    manifest = {
        "build_id": str(uuid.uuid4()),
        "doc_count": int(doc_count),
        "n_shards": n_shards,
        "n_buckets": n_buckets,
        "bucket_boundaries": [] if boundaries is None else [int(b) for b in boundaries],
        "elapsed_sec": round(time.time() - t0, 3),
        "runs": lineage.to_dict(orient="records"),
    }
    write_manifest(build_dir, manifest)
    return manifest
