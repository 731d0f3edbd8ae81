"""Tombstone deletion (marginalia_ray.index.delete): deleting docs from
an immutable build must reproduce the fresh build over the surviving
journal rows — per-term posting lists (ids AND metas), forward lookups,
manifest counts, and engine-level query results — and overwrite_merge
must give the reference's loader-overwrite re-crawl semantics."""

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from marginalia_ray.functions.hashing import term_hash
from marginalia_ray.index.build import build_index
from marginalia_ray.index.delete import delete_docs, overwrite_merge
from marginalia_ray.index.segment import ForwardIndex, read_manifest
from marginalia_ray.query.engine import IndexSearcher, SearchSpec, Subquery
from marginalia_ray.sources.factors import make_factors_journal

PROBE_TERMS = ["1", "2", "3", "5", "17", "100", "251", "509"]


def _filter_journal(j: pa.Table, keep_fn) -> pa.Table:
    urls = (j["doc_id"].to_numpy().astype(np.uint64) & np.uint64(0xFFFFFFFF)).astype(
        np.int64
    )
    return j.filter(pa.array([bool(keep_fn(u)) for u in urls]))


@pytest.fixture(scope="module")
def deleted_vs_fresh(ray_session, tmp_path_factory):
    j = make_factors_journal()
    full_dir = tmp_path_factory.mktemp("full")
    build_index(ray.data.from_arrow(j), full_dir, n_shards=4, n_buckets=2)

    tombs = [i for i in range(1, 512) if i % 7 == 0]
    del_dir = tmp_path_factory.mktemp("deleted")
    manifest = delete_docs(full_dir, del_dir, tombs)

    fresh_dir = tmp_path_factory.mktemp("fresh")
    build_index(
        ray.data.from_arrow(_filter_journal(j, lambda u: u % 7 != 0)),
        fresh_dir,
        n_shards=4,
        n_buckets=2,
    )
    return full_dir, del_dir, fresh_dir, manifest, tombs


class TestDeleteParity:
    def test_posting_lists_identical(self, deleted_vs_fresh):
        _, del_dir, fresh_dir, _, _ = deleted_vs_fresh
        sd, sf = IndexSearcher(del_dir), IndexSearcher(fresh_dir)
        for t in PROBE_TERMS:
            ids_d, m_d = sd.postings("full", term_hash(t))
            ids_f, m_f = sf.postings("full", term_hash(t))
            np.testing.assert_array_equal(ids_d, ids_f)
            np.testing.assert_array_equal(m_d, m_f)
            ids_dp, _ = sd.postings("prio", term_hash(t))
            ids_fp, _ = sf.postings("prio", term_hash(t))
            np.testing.assert_array_equal(ids_dp, ids_fp)

    def test_no_tombstoned_url_survives(self, deleted_vs_fresh):
        _, del_dir, _, _, tombs = deleted_vs_fresh
        tomb_set = set(tombs)
        fwd = ForwardIndex(del_dir)
        assert not (set(fwd.url_ids.tolist()) & tomb_set)
        sd = IndexSearcher(del_dir)
        for t in PROBE_TERMS:
            ids, _ = sd.postings("full", term_hash(t))
            urls = (ids & np.uint64(0xFFFFFFFF)).astype(np.int64)
            assert not (set(urls.tolist()) & tomb_set)

    def test_manifest_counts(self, deleted_vs_fresh):
        full_dir, _, fresh_dir, manifest, tombs = deleted_vs_fresh
        full_m = read_manifest(full_dir)
        fresh_m = read_manifest(fresh_dir)
        assert manifest["doc_count"] == fresh_m["doc_count"]
        assert manifest["n_deleted_docs"] == len(tombs)
        assert manifest["deleted_from"] == full_m["build_id"]

    def test_query_parity(self, deleted_vs_fresh):
        _, del_dir, fresh_dir, _, _ = deleted_vs_fresh
        sd, sf = IndexSearcher(del_dir), IndexSearcher(fresh_dir)
        spec = SearchSpec(
            subqueries=[Subquery(include=["3", "5"], exclude=["2"])], limit_total=100
        )
        rd = [(r.url_id, r.score) for r in sd.search(spec)]
        rf = [(r.url_id, r.score) for r in sf.search(spec)]
        assert rd == rf and len(rd) > 0

    def test_resume_markers_hit(self, deleted_vs_fresh, tmp_path):
        full_dir, del_dir, _, manifest, tombs = deleted_vs_fresh
        # identical re-run reuses every shard marker: same run lineage
        again = delete_docs(full_dir, del_dir, tombs)
        assert again["runs"] == manifest["runs"]
        assert again["doc_count"] == manifest["doc_count"]
        # a DIFFERENT tombstone set invalidates the job and rewrites
        other = delete_docs(full_dir, del_dir, tombs[:3])
        assert other["n_deleted_docs"] == 3


class TestOverwriteMerge:
    def test_recrawl_replaces_old_versions(self, ray_session, tmp_path_factory):
        from marginalia_ray.model.codecs import encode_doc_meta

        j = make_factors_journal()
        old_dir = tmp_path_factory.mktemp("old")
        build_index(ray.data.from_arrow(j), old_dir, n_shards=4, n_buckets=2)

        # re-crawl slice: every doc with url % 5 == 0, new doc_meta
        slice_tbl = _filter_journal(j, lambda u: u % 5 == 0)
        new_meta = pa.array(
            [encode_doc_meta(year=4, sets=1, quality=3)] * slice_tbl.num_rows,
            type=pa.uint64(),
        )
        v2 = slice_tbl.set_column(
            slice_tbl.schema.get_field_index("doc_meta"), "doc_meta", new_meta
        )
        new_dir = tmp_path_factory.mktemp("new")
        build_index(ray.data.from_arrow(v2), new_dir, n_shards=4, n_buckets=2)

        out_dir = tmp_path_factory.mktemp("overwritten")
        overwrite_merge(old_dir, new_dir, out_dir)
        # the tombstoned intermediate is cleaned up after a successful
        # merge (one leak per re-crawl cycle would double storage)
        assert not (Path(str(out_dir) + "_tombstoned")).exists()

        # reference result: fresh build over (old minus slice) + v2
        expect_tbl = pa.concat_tables(
            [_filter_journal(j, lambda u: u % 5 != 0), v2]
        )
        expect_dir = tmp_path_factory.mktemp("expect")
        build_index(
            ray.data.from_arrow(expect_tbl), expect_dir, n_shards=4, n_buckets=2
        )

        so, se = IndexSearcher(out_dir), IndexSearcher(expect_dir)
        for t in PROBE_TERMS:
            ids_o, m_o = so.postings("full", term_hash(t))
            ids_e, m_e = se.postings("full", term_hash(t))
            np.testing.assert_array_equal(np.sort(ids_o), np.sort(ids_e))
            # metas aligned per sorted id
            oo, eo = np.argsort(ids_o, kind="stable"), np.argsort(ids_e, kind="stable")
            np.testing.assert_array_equal(m_o[oo], m_e[eo])
        assert read_manifest(out_dir)["doc_count"] == expect_tbl.num_rows

    def test_empty_tombstones_is_identity_copy(self, ray_session, tmp_path_factory):
        j = make_factors_journal()
        src = tmp_path_factory.mktemp("src")
        build_index(ray.data.from_arrow(j), src, n_shards=2, n_buckets=1)
        out = tmp_path_factory.mktemp("copy")
        manifest = delete_docs(src, out, [])
        assert manifest["doc_count"] == read_manifest(src)["doc_count"]
        assert manifest["n_deleted_docs"] == 0
        s0, s1 = IndexSearcher(src), IndexSearcher(out)
        for t in PROBE_TERMS:
            a, ma = s0.postings("full", term_hash(t))
            b, mb = s1.postings("full", term_hash(t))
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(ma, mb)
