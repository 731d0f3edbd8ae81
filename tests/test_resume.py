"""Partition-level lineage + resume (north_rule checkpoint requirement)."""

import json
import shutil
from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def multi_file_pages(ray_session, tmp_path_factory):
    from marginalia_ray.sources.pages import pages_parquet

    # 4000 rows -> 2 input files (2000-row chunks)
    return pages_parquet(4000, cache_dir=str(tmp_path_factory.mktemp("pages")))


def test_partition_lineage_written(ray_session, multi_file_pages, tmp_path):
    from marginalia_ray.pipelines.index_pipeline import run_index_pipeline

    out = tmp_path / "idx"
    m = run_index_pipeline(
        multi_file_pages, str(out), n_shards=4, concurrency=2, journal_partitions=2
    )
    parts = sorted((out / "journal").glob("part-*/_LINEAGE.json"))
    assert len(parts) == 2
    lin = json.loads(parts[0].read_text())
    assert lin["docs_ok"] > 0 and lin["input_files"] and lin["sec"] > 0
    done = json.loads((out / "journal" / "_COMPLETE.json").read_text())
    assert done["docs_ok"] == m["doc_count"]


def test_resume_skips_complete_partitions(ray_session, multi_file_pages, tmp_path):
    import time

    from marginalia_ray.pipelines.index_pipeline import run_index_pipeline

    out = tmp_path / "idx"
    m1 = run_index_pipeline(
        multi_file_pages, str(out), n_shards=4, concurrency=2, journal_partitions=2
    )

    # simulate a crash after partition 0: drop the completion marker and
    # partition 1's lineage + data
    (out / "journal" / "_COMPLETE.json").unlink()
    shutil.rmtree(out / "journal" / "part-0001")

    t0 = time.time()
    m2 = run_index_pipeline(
        multi_file_pages, str(out), n_shards=4, concurrency=2, journal_partitions=2,
        build_id="build-r",
    )
    # partition 0 skipped (lineage intact), partition 1 reconverted
    assert m2["doc_count"] == m1["doc_count"]
    lin0 = json.loads((out / "journal" / "part-0000" / "_LINEAGE.json").read_text())
    lin0b = json.loads((out / "journal" / "part-0000" / "_LINEAGE.json").read_text())
    assert lin0["finished_at"] == lin0b["finished_at"]  # untouched

    # search works on the resumed build
    from marginalia_ray.query.engine import IndexSearcher

    s = IndexSearcher(out)
    assert len(s.search_words(["search"])) > 0


def test_resume_invalidates_stale_lineage_on_input_change(ray_session, tmp_path):
    """A checkpoint is only valid for the same input file set: adding a
    crawl shard must reconvert the affected partition, not silently skip
    it on stale lineage."""
    import shutil as _sh

    from marginalia_ray.pipelines.index_pipeline import run_index_pipeline
    from marginalia_ray.sources.pages import pages_parquet

    src = pages_parquet(2000, cache_dir=str(tmp_path / "pages_a"))
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    files = sorted(Path(src).glob("*.parquet"))
    _sh.copy(files[0], pages_dir / "aaa.parquet")

    out = tmp_path / "idx"
    m1 = run_index_pipeline(
        str(pages_dir), str(out), n_shards=4, concurrency=2, journal_partitions=1
    )

    # corpus grows: a second shard lands; the _COMPLETE marker is gone
    # (the new data invalidates the journal-level checkpoint too)
    extra = pages_parquet(1000, seed=77, cache_dir=str(tmp_path / "pages_b"))
    _sh.copy(sorted(Path(extra).glob("*.parquet"))[0], pages_dir / "bbb.parquet")
    (out / "journal" / "_COMPLETE.json").unlink()

    m2 = run_index_pipeline(
        str(pages_dir), str(out), n_shards=4, concurrency=2, journal_partitions=1,
        build_id="build-2",
    )
    assert m2["doc_count"] > m1["doc_count"]  # new shard's docs are present
    lin = json.loads((out / "journal" / "part-0000" / "_LINEAGE.json").read_text())
    assert len(lin["input_files"]) == 2  # lineage regenerated for the new set
