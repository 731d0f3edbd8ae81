"""Immutable index segments: the on-disk replacement for the reference's
mmap'd B-tree reverse index + forward index
(/root/reference/code/features-index/index-reverse/.../ReverseIndexFullReader.java:20-118,
 .../index-forward/.../ForwardIndexReader.java:27-95,
 .../index-service/.../IndexServicesFactory.java:60-209).

Layout of a build directory (one per index build; atomically "switched live"
by pointing a `CURRENT` file at it, mirroring switchFilesJob):

    build_dir/
      MANIFEST.json                 # doc_count, n_shards, n_buckets, lineage
      forward/part-*.parquet        # (url_id, doc_meta, domain_id), rank applied
      full/shard=S/bucket=B.terms.parquet   # term_hash, doc_freq, offset, nbytes
      full/shard=S/bucket=B.postings.bin    # concatenated encoded posting lists
      prio/shard=S/...                      # same, ENTRY_SIZE=1 (no metas)

Scale notes (the design constraint is a 256-node cluster / 100 TB corpus):
  * shard = term_hash % n_shards — the unit of query-side ownership.
  * bucket = quantile range of the rank-encoded doc id (boundaries sampled
    at build time, stored in MANIFEST) — a *doc-range* split of
    each shard so the build shuffle's groups stay bounded under Zipfian term
    skew (a hot term's postings land in many (shard,bucket) groups).
    Because bucket boundaries are monotone in doc id, per-term posting lists
    across buckets concatenate in sorted order — salted runs merge by pure
    concatenation, no k-way merge pass (merge determinism is trivially
    byte-stable).
  * Readers mmap postings.bin (np.memmap) and decode one term on demand.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from marginalia_ray.index.postings import decode_term_slice, encode_run

U64 = np.uint64

TERMS_SCHEMA = pa.schema(
    [
        ("term_hash", pa.uint64()),
        ("doc_freq", pa.int64()),
        ("offset", pa.int64()),
        ("nbytes", pa.int64()),
    ]
)


def bucket_of(enc_doc_ids: np.ndarray, boundaries: np.ndarray | None) -> np.ndarray:
    """Monotone doc-range bucket via sampled quantile split points.

    `boundaries` is a sorted uint64 array of n_buckets-1 split points over the
    rank-encoded doc-id space (None/empty => single bucket 0); the bucket is
    the count of boundaries <= enc_id.  searchsorted keeps the map monotone
    non-decreasing in enc id (so per-term runs concatenate in sorted order
    across buckets), and quantile boundaries keep buckets balanced even when
    the 8-bit rank byte is constant (the default-255 case, where any fixed
    top-bits scheme would put every posting in one bucket — enc ids are
    rank<<32|url_id, so bits 40..63 are always zero)."""
    if boundaries is None or len(boundaries) == 0:
        return np.zeros(len(enc_doc_ids), dtype=np.int64)
    b = np.asarray(boundaries, dtype=U64)
    return np.searchsorted(b, enc_doc_ids, side="right").astype(np.int64)


def write_run(
    out_dir: str | Path,
    kind: str,  # "full" | "prio"
    shard: int,
    bucket: int,
    term_hashes: np.ndarray,  # sorted-by-(term,doc) flat postings
    doc_ids: np.ndarray,
    metas: np.ndarray | None,  # None for prio
) -> dict:
    """Write one (shard, bucket) posting run.  Input arrays must already be
    lexsorted by (term_hash, doc_id).  Returns a lineage/manifest row.
    Writes are atomic (tmp + rename) so re-runs are idempotent.

    Layout: terms.parquet (term_hash, doc_freq, offset, nbytes) +
    postings.bin = 24-byte header (len_deltas, n_blocks, n_metas as u64)
    then sections [varbyte deltas][block_max u64][block_off u32][metas u64].
    Fully vectorized (encode_run) — no per-term Python."""
    d = Path(out_dir) / kind / f"shard={shard:05d}"
    d.mkdir(parents=True, exist_ok=True)

    run = encode_run(term_hashes, doc_ids, metas)

    terms = pa.table(
        {
            "term_hash": pa.array(run["term_hash"], type=pa.uint64()),
            "doc_freq": pa.array(run["doc_freq"]),
            "offset": pa.array(run["offset"]),
            "nbytes": pa.array(run["nbytes"]),
        }
    )

    post_path = d / f"bucket={bucket:04d}.postings.bin"
    terms_path = d / f"bucket={bucket:04d}.terms.parquet"
    m = run["metas"]
    header = np.array(
        [len(run["deltas"]), len(run["block_max"]), 0 if m is None else len(m)],
        dtype=np.uint64,
    )
    tmp = str(post_path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header.tobytes())
        f.write(run["deltas"].tobytes())
        f.write(run["block_max"].tobytes())
        f.write(run["block_off"].tobytes())
        if m is not None:
            f.write(m.tobytes())
    os.replace(tmp, post_path)
    tmp = str(terms_path) + ".tmp"
    pq.write_table(terms, tmp)
    os.replace(tmp, terms_path)

    return {
        "kind": kind,
        "shard": shard,
        "bucket": bucket,
        "n_terms": len(run["term_hash"]),
        "n_postings": int(len(term_hashes)),
        "bytes": int(len(run["deltas"])),
    }


class SegmentShardReader:
    """Query-side reader for one shard of one kind (full/prio).

    Loads the (small) term directories of every bucket eagerly, memory-maps
    the posting bins, decodes per-term lists on demand, and concatenates
    across buckets in bucket order (which is doc-id order by construction)."""

    def __init__(self, build_dir: str | Path, kind: str, shard: int):
        self.kind = kind
        self.has_meta = kind == "full"
        d = Path(build_dir) / kind / f"shard={shard:05d}"
        self._buckets = []  # [(terms dict, sections dict)]
        if not d.exists():
            return
        from marginalia_ray.index.postings import BLOCK_SIZE

        for terms_path in sorted(d.glob("bucket=*.terms.parquet")):
            bin_path = terms_path.with_name(terms_path.name.replace(".terms.parquet", ".postings.bin"))
            t = pq.read_table(terms_path)
            df = t["doc_freq"].to_numpy()
            meta_off = np.cumsum(df) - df
            nblocks = -(-df // BLOCK_SIZE)
            directory = {
                "hash": t["term_hash"].to_numpy(),
                "doc_freq": df,
                "offset": t["offset"].to_numpy(),
                "nbytes": t["nbytes"].to_numpy(),
                "meta_off": meta_off,
                "n_blocks": nblocks,
                "block_base": np.cumsum(nblocks) - nblocks,
            }
            mm = (
                np.memmap(bin_path, dtype=np.uint8, mode="r")
                if bin_path.stat().st_size
                else np.zeros(24, dtype=np.uint8)
            )
            head = np.frombuffer(mm[:24], dtype=np.uint64)
            ld, nb, nm = int(head[0]), int(head[1]), int(head[2])
            o = 24
            sections = {
                "deltas": mm[o : o + ld],
                "block_max": np.frombuffer(mm[o + ld : o + ld + 8 * nb], dtype=U64),
                "block_off": np.frombuffer(
                    mm[o + ld + 8 * nb : o + ld + 12 * nb], dtype=np.uint32
                ),
                "metas": (
                    np.frombuffer(
                        mm[o + ld + 12 * nb : o + ld + 12 * nb + 8 * nm], dtype=U64
                    )
                    if nm
                    else None
                ),
            }
            self._buckets.append((directory, sections))

    def doc_freq(self, term_hash: int) -> int:
        total = 0
        for directory, _ in self._buckets:
            i = np.searchsorted(directory["hash"], U64(term_hash))
            if i < len(directory["hash"]) and directory["hash"][i] == U64(term_hash):
                total += int(directory["doc_freq"][i])
        return total

    def postings(self, term_hash: int) -> tuple[np.ndarray, np.ndarray | None]:
        """(sorted doc_ids, metas or None) for a term, concatenated over buckets."""
        ids_parts, meta_parts = [], []
        for directory, sections in self._buckets:
            i = np.searchsorted(directory["hash"], U64(term_hash))
            if i < len(directory["hash"]) and directory["hash"][i] == U64(term_hash):
                o = int(directory["offset"][i])
                n = int(directory["nbytes"][i])
                df = int(directory["doc_freq"][i])
                ids_parts.append(decode_term_slice(sections["deltas"][o : o + n], df))
                if self.has_meta:
                    mo = int(directory["meta_off"][i])
                    meta_parts.append(sections["metas"][mo : mo + df])
        if not ids_parts:
            return np.zeros(0, dtype=U64), (np.zeros(0, dtype=U64) if self.has_meta else None)
        ids = np.concatenate(ids_parts)
        metas = np.concatenate(meta_parts) if self.has_meta else None
        return ids, metas

    def postings_overlap(
        self, term_hash: int, cand_sorted: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray | None]:
        """Block-max skip decoding: (sorted doc_ids, metas) restricted to
        the posting blocks that can contain any of the sorted candidate
        ids — a SUPERSET of the true intersection, so retain / reject /
        meta-gather via searchsorted give identical answers while decoding
        at most len(cand) blocks instead of the whole list (the block-max
        WAND skip primitive; block starts are absolute doc ids so each
        block decodes independently)."""
        from marginalia_ray.index.postings import BLOCK_SIZE, varbyte_decode

        cand = np.asarray(cand_sorted, dtype=U64)
        ids_parts, meta_parts = [], []
        for directory, sections in self._buckets:
            i = np.searchsorted(directory["hash"], U64(term_hash))
            if i >= len(directory["hash"]) or directory["hash"][i] != U64(term_hash):
                continue
            df = int(directory["doc_freq"][i])
            nb = int(directory["n_blocks"][i])
            base = int(directory["block_base"][i])
            off = int(directory["offset"][i])
            nbytes = int(directory["nbytes"][i])
            bmax = sections["block_max"][base : base + nb]
            # the block whose max first reaches each candidate may hold it
            need = np.unique(np.searchsorted(bmax, cand))
            need = need[need < nb]
            if len(need) == 0:
                continue
            boffs = sections["block_off"][base : base + nb]
            deltas = sections["deltas"][off : off + nbytes]
            mo = int(directory["meta_off"][i]) if self.has_meta else 0
            for b in need:
                b = int(b)
                lo = int(boffs[b])
                hi = int(boffs[b + 1]) if b + 1 < nb else nbytes
                count = min(BLOCK_SIZE, df - BLOCK_SIZE * b)
                vals = varbyte_decode(deltas[lo:hi], count)
                ids_parts.append(np.cumsum(vals, dtype=U64))  # first is absolute
                if self.has_meta:
                    meta_parts.append(
                        sections["metas"][mo + BLOCK_SIZE * b : mo + BLOCK_SIZE * b + count]
                    )
        if not ids_parts:
            return np.zeros(0, dtype=U64), (np.zeros(0, dtype=U64) if self.has_meta else None)
        ids = np.concatenate(ids_parts)
        metas = np.concatenate(meta_parts) if self.has_meta else None
        return ids, metas


class ForwardIndex:
    """In-memory forward index: url_id -> (doc_meta, domain_id) via sorted
    arrays + searchsorted (ForwardIndexReader.java:27-95 semantics; missing
    ids return meta 0 / domain -1)."""

    def __init__(self, build_dir: str | Path):
        files = sorted((Path(build_dir) / "forward").glob("*.parquet"))
        if files:
            t = pa.concat_tables([pq.read_table(f) for f in files])
            url = t["url_id"].to_numpy()
            order = np.argsort(url, kind="stable")
            self.url_ids = url[order]
            self.doc_metas = t["doc_meta"].to_numpy()[order]
            self.domain_ids = t["domain_id"].to_numpy()[order]
            # url_id is a 32-bit hash of the full URL (not a DB-assigned
            # unique id as in the reference).  Duplicate ids are almost
            # always RE-CRAWLS of the same url (same url => same id; the
            # loader-overwrite semantics keep one row); true cross-url hash
            # collisions are ~n^2/2^33.  Dedup keeping the first row in
            # stable order so lookups are unambiguous and deterministic.
            if len(self.url_ids) > 1:
                dup = self.url_ids[1:] == self.url_ids[:-1]
                self.n_collisions = int(dup.sum())
                if self.n_collisions:
                    keep = np.r_[True, ~dup]
                    self.url_ids = self.url_ids[keep]
                    self.doc_metas = self.doc_metas[keep]
                    self.domain_ids = self.domain_ids[keep]
            else:
                self.n_collisions = 0
        else:
            self.n_collisions = 0
            self.url_ids = np.zeros(0, dtype=np.int64)
            self.doc_metas = np.zeros(0, dtype=U64)
            self.domain_ids = np.zeros(0, dtype=np.int64)

    def lookup(self, url_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(doc_meta, domain_id) arrays aligned with url_ids."""
        idx = np.searchsorted(self.url_ids, url_ids)
        idx = np.minimum(idx, max(0, len(self.url_ids) - 1))
        if len(self.url_ids) == 0:
            return (
                np.zeros(len(url_ids), dtype=U64),
                np.full(len(url_ids), -1, dtype=np.int64),
            )
        hit = self.url_ids[idx] == url_ids
        metas = np.where(hit, self.doc_metas[idx], U64(0))
        domains = np.where(hit, self.domain_ids[idx], -1)
        return metas, domains


def write_manifest(build_dir: str | Path, manifest: dict) -> None:
    p = Path(build_dir) / "MANIFEST.json"
    tmp = str(p) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=int)
    os.replace(tmp, p)


def read_manifest(build_dir: str | Path) -> dict | None:
    p = Path(build_dir) / "MANIFEST.json"
    if not p.exists():
        return None
    with open(p) as f:
        return json.load(f)


def set_current(root: str | Path, build_id: str) -> None:
    """Atomic live-pointer swap (SearchIndex.switchIndex equivalent)."""
    p = Path(root) / "CURRENT"
    tmp = str(p) + ".tmp"
    with open(tmp, "w") as f:
        f.write(build_id)
    os.replace(tmp, p)


def get_current(root: str | Path) -> str | None:
    p = Path(root) / "CURRENT"
    return p.read_text().strip() if p.exists() else None
