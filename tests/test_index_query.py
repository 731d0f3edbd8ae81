"""Rank-parity gate: the reference query set over the factors corpus.

Port of IndexQueryServiceIntegrationTest
(/root/reference/code/services-core/index-service/src/test/java/nu/marginalia/index/svc/IndexQueryServiceIntegrationTest.java:71-199):
doc i (1..511) contains keywords = decimal factors of i with
WordMetadata(positions=factor_index, {Title}); docMeta year=i%5, sets=i,
quality=i%20.  Expected results are exact urlId arrays in exact order.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from marginalia_ray.functions.hashing import term_hash
from marginalia_ray.index.build import build_index
from marginalia_ray.model.codecs import encode_doc_meta, encode_word_meta, WordFlags
from marginalia_ray.query.engine import IndexSearcher, SearchSpec, SpecLimit, Subquery


from marginalia_ray.sources.factors import factors, make_factors_journal


def make_journal(with_domain=False):
    return make_factors_journal(with_domain=with_domain)


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("idx")
    journal = ray.data.from_arrow(make_journal())
    build_index(journal, d, n_shards=8, n_buckets=1)
    return d


@pytest.fixture(scope="module")
def built_domain_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("idx_domain")
    journal = ray.data.from_arrow(make_journal(with_domain=True))
    build_index(journal, d, n_shards=8, n_buckets=1)
    return d


class TestFactorsCorpusParity:
    def test_will_it_blend(self, built_index):
        """include {3,5,2} exclude {4} => exactly [30,90,...,510] in order."""
        s = IndexSearcher(built_index)
        res = s.search(
            SearchSpec(
                subqueries=[Subquery(include=["3", "5", "2"], exclude=["4"])],
                limit_by_domain=10,
                limit_total=10,
                fetch_size=4000,
            )
        )
        assert [r.url_id for r in res] == [30, 90, 150, 210, 270, 330, 390, 450, 510]

    def test_domain_query(self, built_domain_index):
        s = IndexSearcher(built_domain_index)
        res = s.search(
            SearchSpec(
                subqueries=[Subquery(include=["3", "5", "2"], exclude=["4"])],
                limit_by_domain=10,
                limit_total=10,
                fetch_size=4000,
                domains=[2],
            )
        )
        assert [r.url_id for r in res] == [210, 270]

    def test_year_query(self, built_index):
        s = IndexSearcher(built_index)
        res = s.search(
            SearchSpec(
                subqueries=[Subquery(include=["4"])],
                limit_by_domain=10,
                limit_total=10,
                fetch_size=4000,
                year=SpecLimit.eq(1998),
            )
        )
        assert len(res) == 10
        from marginalia_ray.model.codecs import doc_meta_year

        metas, _ = s.forward.lookup(np.array([r.url_id for r in res], dtype=np.int64))
        assert set(int(y) for y in doc_meta_year(metas)) == {1998}

    def test_doc_freq_matches_groupby(self, built_index):
        """G5: per-term doc_freq == number of docs containing the term."""
        s = IndexSearcher(built_index)
        # term "2" appears in every even doc: 255 of 1..511
        assert s.num_hits(term_hash("2")) == 255
        assert s.num_hits(term_hash("3")) == 170
        assert s.num_hits(term_hash("5")) == 102
        assert s.num_hits(term_hash("511")) == 1
        assert s.num_hits(term_hash("512")) == 0

    def test_postings_sorted_and_rank_encoded(self, built_index):
        s = IndexSearcher(built_index)
        ids, metas = s.postings("full", term_hash("7"))
        assert len(ids) == 73  # multiples of 7 in 1..511
        assert (np.diff(ids.astype(np.int64)) > 0).all()
        # rank defaults to 255 (empty DomainRankings) -> top 32 bits == 255
        assert set(int(i) >> 32 for i in ids) == {255}

    def test_priority_index_subset(self, built_index):
        # every posting has Title flag -> prio df == full df
        s = IndexSearcher(built_index)
        assert s.num_hits_prio(term_hash("3")) == s.num_hits(term_hash("3"))


class TestBuildDeterminism:
    def test_bucketed_build_identical(self, ray_session, tmp_path_factory):
        """Salted (bucketed) build produces identical per-term posting lists
        and identical query results vs the single-bucket build (the merge-
        determinism gate of FIXTURES.md F3)."""
        d1 = tmp_path_factory.mktemp("det1")
        d4 = tmp_path_factory.mktemp("det4")
        journal = ray.data.from_arrow(make_journal())
        build_index(journal, d1, n_shards=4, n_buckets=1)
        journal2 = ray.data.from_arrow(make_journal())
        build_index(journal2, d4, n_shards=4, n_buckets=4)

        # the salt must actually split: multiple bucket=* run files per shard
        # (guards against the bucket fn silently mapping everything to 0)
        bucket_files = {
            p.name for p in (d4 / "full").glob("shard=*/bucket=*.terms.parquet")
        }
        assert len(bucket_files) >= 2, bucket_files

        s1, s4 = IndexSearcher(d1), IndexSearcher(d4)
        for t in ["1", "2", "3", "17", "100", "509"]:
            ids1, m1 = s1.postings("full", term_hash(t))
            ids4, m4 = s4.postings("full", term_hash(t))
            np.testing.assert_array_equal(ids1, ids4)
            np.testing.assert_array_equal(m1, m4)

        spec = SearchSpec(subqueries=[Subquery(include=["3", "5", "2"], exclude=["4"])])
        assert [r.url_id for r in s1.search(spec)] == [r.url_id for r in s4.search(spec)]

    def test_non_power_of_two_buckets(self, ray_session, tmp_path_factory):
        """n_buckets=3 (quantile boundaries need no power-of-two) keeps
        per-term lists sorted and identical to the single-bucket build."""
        d1 = tmp_path_factory.mktemp("npt1")
        d3 = tmp_path_factory.mktemp("npt3")
        build_index(ray.data.from_arrow(make_journal()), d1, n_shards=4, n_buckets=1)
        build_index(ray.data.from_arrow(make_journal()), d3, n_shards=4, n_buckets=3)
        s1, s3 = IndexSearcher(d1), IndexSearcher(d3)
        for t in ["1", "2", "3", "251"]:
            ids1, m1 = s1.postings("full", term_hash(t))
            ids3, m3 = s3.postings("full", term_hash(t))
            assert (np.diff(ids3.astype(np.int64)) > 0).all()
            np.testing.assert_array_equal(ids1, ids3)
            np.testing.assert_array_equal(m1, m3)

    def test_rebuild_into_same_dir_is_clean(self, ray_session, tmp_path_factory):
        """Re-running build_index into an existing build_dir must not
        accumulate stale forward/bucket files (doubling doc_count)."""
        d = tmp_path_factory.mktemp("rebuild")
        build_index(ray.data.from_arrow(make_journal()), d, n_shards=4, n_buckets=4)
        m2 = build_index(ray.data.from_arrow(make_journal()), d, n_shards=4, n_buckets=1)
        assert m2["doc_count"] == 511
        s = IndexSearcher(d)
        ids, _ = s.postings("full", term_hash("2"))
        assert len(ids) == 255  # not doubled, no stale bucket files

    def test_partitioning_invariance(self, ray_session, tmp_path_factory):
        """Build with different input block structure => identical segments."""
        da = tmp_path_factory.mktemp("parta")
        db = tmp_path_factory.mktemp("partb")
        t = make_journal()
        build_index(ray.data.from_arrow(t), da, n_shards=4)
        build_index(ray.data.from_arrow(t).repartition(7), db, n_shards=4)
        sa, sb = IndexSearcher(da), IndexSearcher(db)
        for term in ["2", "3", "251"]:
            ia, ma = sa.postings("full", term_hash(term))
            ib, mb = sb.postings("full", term_hash(term))
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(ma, mb)


class TestAutoBuckets:
    def test_sketch_and_auto_bucket_choice(self, ray_session):
        from marginalia_ray.index.build import choose_buckets, estimate_max_doc_freq

        journal = ray.data.from_arrow(make_journal())
        # term "1" appears in every doc: max df == 511
        assert estimate_max_doc_freq(journal, 8) == 511
        # tiny target forces splitting: ceil(511/100) == 6 buckets
        assert choose_buckets(journal, 8, target=100) == 6
        assert choose_buckets(journal, 8, target=1_000_000) == 1

    def test_auto_bucket_build_matches_single_bucket(self, ray_session, tmp_path):
        from marginalia_ray.index.build import build_index
        from marginalia_ray.index.build import TARGET_RUN_POSTINGS

        d1 = tmp_path / "b1"
        da = tmp_path / "auto"
        build_index(ray.data.from_arrow(make_journal()), d1, n_shards=4, n_buckets=1)
        build_index(ray.data.from_arrow(make_journal()), da, n_shards=4, n_buckets="auto")
        s1, sa = IndexSearcher(d1), IndexSearcher(da)
        for t in ("2", "3", "17"):
            i1, m1 = s1.postings("full", term_hash(t))
            ia, ma = sa.postings("full", term_hash(t))
            assert (i1 == ia).all()
            assert (m1 == ma).all()


class TestBlockMaxSkip:
    def test_overlap_subset_equals_full_intersection(self, built_index):
        """postings_overlap decodes only candidate-relevant blocks but must
        give identical retain/reject/meta answers to the full decode."""
        from marginalia_ray.index.segment import SegmentShardReader
        from marginalia_ray.query.engine import _difference_sorted, _intersect_sorted

        s = IndexSearcher(built_index)
        th = term_hash("1")  # every doc -> 511 postings, several blocks
        full_ids, full_metas = s.postings("full", th)
        assert len(full_ids) == 511

        cand = full_ids[[0, 5, 100]].copy()  # candidates confined to block 0
        shard = s._shard("full", th)
        sub_ids, sub_metas = shard.postings_overlap(th, cand)
        # proper subset (blocks skipped), sorted, same intersection
        assert 0 < len(sub_ids) < len(full_ids)
        assert (np.diff(sub_ids.astype(np.int64)) > 0).all()
        np.testing.assert_array_equal(
            _intersect_sorted(cand, sub_ids), _intersect_sorted(cand, full_ids)
        )
        np.testing.assert_array_equal(
            _difference_sorted(cand, sub_ids), _difference_sorted(cand, full_ids)
        )
        # meta gather identical on the subset
        for ids, metas in ((full_ids, full_metas), (sub_ids, sub_metas)):
            idx = np.minimum(np.searchsorted(ids, cand), len(ids) - 1)
            hit = ids[idx] == cand
            got = np.where(hit, metas[idx], np.uint64(0))
            if ids is full_ids:
                want = got
        np.testing.assert_array_equal(got, want)

    def test_search_results_identical_with_and_without_skip(self, built_index):
        s1 = IndexSearcher(built_index)
        s1.SKIP_DECODE_FACTOR = 8
        s2 = IndexSearcher(built_index)
        s2.SKIP_DECODE_FACTOR = 10**9  # effectively disables the skip path
        spec = SearchSpec(
            subqueries=[Subquery(include=["3", "5", "2"], exclude=["4"])],
            limit_by_domain=10, limit_total=10, fetch_size=4000,
        )
        r1 = [(r.url_id, round(r.score, 9)) for r in s1.search(spec)]
        r2 = [(r.url_id, round(r.score, 9)) for r in s2.search(spec)]
        assert r1 == r2


class TestTermCoherenceGolden:
    """Mirror of the reference's TermCoherenceFactorTest.java:17-42: the
    coherence factor over a (n_terms, n_docs) word-meta matrix must be
    exactly 1.0 when both terms set every one of the 56 position bits,
    and exactly 0.0 when neither sets any."""

    def _metas(self, pos_a: int, pos_b: int) -> np.ndarray:
        from marginalia_ray.model.codecs import encode_word_meta

        return np.array(
            [
                [encode_word_meta(positions=pos_a, flags=0)],
                [encode_word_meta(positions=pos_b, flags=0)],
            ],
            dtype=np.uint64,
        )

    def test_all_bits_set_is_one(self):
        from marginalia_ray.query.ranking import term_coherence

        full = (1 << 56) - 1
        assert term_coherence(self._metas(full, full))[0] == pytest.approx(1.0)

    def test_no_bits_set_is_zero(self):
        from marginalia_ray.query.ranking import term_coherence

        assert term_coherence(self._metas(0, 0))[0] == pytest.approx(0.0)

    def test_disjoint_masks_cancel(self):
        # AND semantics: terms that never share a position give zero
        from marginalia_ray.query.ranking import term_coherence

        assert term_coherence(self._metas(0b1111, 0b1111 << 4))[0] == pytest.approx(0.0)

    def test_bits_set_scaling_monotone(self):
        # TermCoherenceFactorTest.testBitMatchScaling: (k/56)^0.25 rises
        from marginalia_ray.query.ranking import term_coherence

        vals = [
            term_coherence(self._metas((1 << k) - 1, (1 << k) - 1))[0]
            for k in range(1, 48)
        ]
        assert all(b > a for a, b in zip(vals, vals[1:]))
        assert vals[0] == pytest.approx((1 / 56.0) ** 0.25)
