"""The flagship pipeline: web pages parquet -> inverted index segments.

Ray-Data-native replacement for ConverterMain + LoaderMain + index
construction (SURVEY.md §3.1-3.3):

    read_parquet(pages, columns pruned)
      -> map_batches(TokenizerStage, concurrency=N)    # actor pool, A1/A2
      -> journal parquet (checkpoint boundary, resumable)
      -> build_index (one groupby shuffle -> immutable segments)

The journal write between the converter and the index build mirrors the
reference's converter/loader file boundary and is what makes the build
resumable: if the journal exists and is complete (lineage manifest), the
converter stage is skipped on re-run.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import ray
import ray.data

from marginalia_ray.index.build import build_index
from marginalia_ray.stages.tokenizer import TokenizerStage

JOURNAL_COLS = ["doc_id", "doc_meta", "term_hashes", "kw_metas"]


def _wait_for_cpu_drain(frac: float = 0.9, timeout: float = 15.0) -> None:
    """Wait for the previous stage's actor pool to release its CPU slots;
    otherwise the next Dataset's tasks queue behind dying actors."""
    try:
        total = ray.cluster_resources().get("CPU", 1)
    except Exception:
        return
    t0 = time.time()
    while time.time() - t0 < timeout:
        if ray.available_resources().get("CPU", 0) >= frac * total:
            return
        time.sleep(0.25)


def convert_pages(
    pages: "ray.data.Dataset",
    *,
    dict_freqs_ref=None,
    doc_count: int = 11_820_118,
    concurrency: int | None = None,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """pages -> journal Dataset (tokenizer actor pool).

    batch_size is small because the html column is fat (SURVEY.md §7.5 #6);
    html is dropped immediately after extraction inside the stage."""
    if concurrency is None:
        # size the actor pool to the Ray cluster's CPUs, not the host's:
        # an over-sized pool leaves pending actors that stall scheduling
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            import os

            ncpu = os.cpu_count() or 8
        concurrency = max(2, ncpu - 1)
    return pages.map_batches(
        TokenizerStage,
        fn_constructor_kwargs={"dict_freqs_ref": dict_freqs_ref, "doc_count": doc_count},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def run_index_pipeline(
    pages_path: str,
    out_root: str,
    *,
    build_id: str = "build-0",
    n_shards: int = 32,
    n_buckets: int = 1,
    concurrency: int | None = None,
    domain_rankings: dict[int, int] | None = None,
    dedup: bool = False,
    rank_domains: bool = False,
    with_term_freq: bool = False,
    resume: bool = True,
) -> dict:
    """End-to-end: pages parquet -> journal -> segments.  Returns manifest.

    Layout under out_root:
        journal/            converter output (parquet, resumable checkpoint)
        <build_id>/         immutable index segments
        CURRENT             live-build pointer (atomic swap)
    """
    out_root = Path(out_root)
    journal_dir = out_root / "journal"
    build_dir = out_root / build_id
    t0 = time.time()

    journal_done = journal_dir / "_COMPLETE.json"
    if not (resume and journal_done.exists()):
        journal_dir.mkdir(parents=True, exist_ok=True)
        import pyarrow.dataset as pads

        avail = set(pads.dataset(str(pages_path)).schema.names)
        cols = [c for c in ("url", "html", "text", "lang") if c in avail]
        pages = ray.data.read_parquet(str(pages_path), columns=cols)
        dict_freqs_ref = None
        doc_count = 11_820_118  # TermFrequencyDict legacy default
        if with_term_freq:
            # pass 0 (G9/A2): corpus doc-frequency dict, broadcast to the
            # tokenizer pool; IDF doc_count becomes the actual corpus size
            from marginalia_ray.pipelines.term_freq import term_freq_dict_ref

            tf_pages = ray.data.read_parquet(str(pages_path), columns=cols)
            dict_freqs_ref = term_freq_dict_ref(tf_pages, use_html="html" in avail)
            doc_count = pages.count()
            _wait_for_cpu_drain()
        journal = convert_pages(
            pages,
            concurrency=concurrency,
            dict_freqs_ref=dict_freqs_ref,
            doc_count=doc_count,
        )
        # keep only indexed docs in the journal; carry the doc table columns
        journal = journal.filter(expr="state == 'OK'")
        if dedup:
            # per-domain LSH near-dup removal (D3), then drop the dead rows
            from marginalia_ray.pipelines.domain_stage import apply_domain_stage

            journal = apply_domain_stage(journal).filter(expr="state == 'OK'")
        journal.write_parquet(str(journal_dir))
        n = sum(
            1 for _ in journal_dir.glob("*.parquet")
        )
        tmp = str(journal_done) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"files": n, "converted_at": time.time()}, f)
        os.replace(tmp, journal_done)

    convert_sec = time.time() - t0
    _wait_for_cpu_drain()
    t1 = time.time()

    if rank_domains and domain_rankings is None:
        # PageRank over the domain link graph (G6) -> rank bytes injected
        # into doc metadata at index build (J2)
        from marginalia_ray.pipelines.domain_rank import compute_domain_rankings

        jlinks = ray.data.read_parquet(str(journal_dir), columns=["url", "links"])
        domain_rankings = compute_domain_rankings(jlinks)

    journal = ray.data.read_parquet(str(journal_dir), columns=JOURNAL_COLS)
    manifest = build_index(
        journal,
        build_dir,
        n_shards=n_shards,
        n_buckets=n_buckets,
        domain_rankings=domain_rankings,
    )
    manifest["convert_sec"] = round(convert_sec, 3)
    manifest["index_sec"] = round(time.time() - t1, 3)
    manifest["total_sec"] = round(time.time() - t0, 3)

    from marginalia_ray.index.segment import set_current

    set_current(out_root, build_id)
    return manifest
