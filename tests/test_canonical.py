"""M24/D4: canonical extraction + fixBadCanonicalTags + canonical dedup.

Fixtures mirror DomainProcessor.fixBadCanonicalTags (DomainProcessor
.java:95-147): blanket canonicals reset, cross-domain canonicals reset,
docs duplicating a crawled canonical target disqualified."""

import pyarrow as pa

from marginalia_ray.pipelines.domain_stage import fix_canonicals_domain_group
from marginalia_ray.stages.extract import extract_document


def _group(rows):
    n = len(rows)
    return pa.table(
        {
            "doc_id": pa.array([r.get("doc_id", (7 << 32) | i) for i, r in enumerate(rows)], pa.uint64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "canonical": pa.array([r.get("canonical", "") for r in rows], pa.string()),
            "body_hash": pa.array([r.get("body_hash", i + 1) for i, r in enumerate(rows)], pa.uint64()),
            "state": pa.array([r.get("state", "OK") for r in rows], pa.string()),
            "term_hashes": pa.array([[1, 2]] * n, pa.list_(pa.uint64())),
            "kw_metas": pa.array([[0, 0]] * n, pa.list_(pa.uint64())),
        }
    )


class TestExtraction:
    def test_canonical_link_extracted_and_resolved(self):
        html = (
            '<html><head><link rel="canonical" href="/x/page"></head>'
            "<body><p>" + "text here. " * 40 + "</p></body></html>"
        )
        doc = extract_document(html, base_url="https://a.example/y/page")
        assert doc.canonical == "https://a.example/x/page"

    def test_no_canonical(self):
        doc = extract_document(
            "<body><p>" + "text. " * 40 + "</p></body>",
            base_url="https://a.example/",
        )
        assert doc.canonical == ""


class TestRepair:
    def test_blanket_canonical_reset(self):
        # three different pages all claim the root as canonical -> blanket;
        # the root itself is crawled, so claimants with distinct content
        # are marked BAD_CANONICAL (root url already taken)
        rows = [
            {"url": "https://a.example/", "canonical": "", "body_hash": 1},
            {"url": "https://a.example/p1", "canonical": "https://a.example/", "body_hash": 2},
            {"url": "https://a.example/p2", "canonical": "https://a.example/", "body_hash": 3},
        ]
        out = fix_canonicals_domain_group(_group(rows))
        states = out["state"].to_pylist()
        assert states[0] == "OK"
        assert states[1] == "BAD_CANONICAL"
        assert states[2] == "BAD_CANONICAL"
        # postings cleared on disqualified rows
        assert out["term_hashes"][1].as_py() == []

    def test_blanket_canonical_uncrawled_target_first_claims(self):
        rows = [
            {"url": "https://a.example/p1", "canonical": "https://a.example/gone", "body_hash": 2},
            {"url": "https://a.example/p2", "canonical": "https://a.example/gone", "body_hash": 3},
        ]
        out = fix_canonicals_domain_group(_group(rows))
        states = out["state"].to_pylist()
        # first claimant reserves the target and keeps its own url; second
        # sees the url as taken -> BAD_CANONICAL
        assert states == ["OK", "BAD_CANONICAL"]
        assert out["canonical"][0].as_py() == "https://a.example/p1"

    def test_cross_domain_canonical_reset(self):
        rows = [
            {"url": "https://a.example/p", "canonical": "https://other.example/p"},
        ]
        out = fix_canonicals_domain_group(_group(rows))
        assert out["canonical"][0].as_py() == "https://a.example/p"
        assert out["state"][0].as_py() == "OK"


class TestDedup:
    def test_duplicate_of_crawled_target_disqualified(self):
        rows = [
            {"url": "https://a.example/main", "canonical": "", "body_hash": 1},
            {"url": "https://a.example/main?print=1", "canonical": "https://a.example/main", "body_hash": 1},
        ]
        out = fix_canonicals_domain_group(_group(rows))
        assert out["state"].to_pylist() == ["OK", "DISQUALIFIED_CANONICAL"]

    def test_uncrawled_canonical_rekeys_doc(self):
        rows = [
            {"url": "https://a.example/alias", "canonical": "https://a.example/true-home", "body_hash": 1},
        ]
        g = _group(rows)
        out = fix_canonicals_domain_group(g)
        assert out["state"][0].as_py() == "OK"
        assert out["url"][0].as_py() == "https://a.example/true-home"
        old_id = g["doc_id"][0].as_py()
        new_id = out["doc_id"][0].as_py()
        assert new_id != old_id
        assert (new_id >> 32) == (old_id >> 32)  # domain part preserved

    def test_shared_uncrawled_canonical_same_hash_no_id_collision(self):
        """Two docs with identical content pointing at the same uncrawled
        canonical: only the first is re-keyed; the second is disqualified
        (previously both re-keyed to the SAME doc_id -> doubled postings)."""
        rows = [
            {"url": "https://a.example/p?ref=x", "canonical": "https://a.example/p", "body_hash": 1},
            {"url": "https://a.example/p?ref=y", "canonical": "https://a.example/p", "body_hash": 1},
        ]
        out = fix_canonicals_domain_group(_group(rows))
        states = out["state"].to_pylist()
        assert states == ["OK", "DISQUALIFIED_CANONICAL"]
        ids = out["doc_id"].to_pylist()
        assert ids[0] != ids[1]


class TestUrlIdCollision:
    """Hash-collision rewrite in dedup_recrawls_domain_group: two distinct
    urls engineered to share the low-32 url_id must both survive with
    distinct doc_ids (the reference avoids this class with DB-assigned
    EC_URL ids; our hashed ids probe to the next free slot)."""

    def test_collision_rewritten_deterministically(self):
        from marginalia_ray.pipelines.domain_stage import dedup_recrawls_domain_group

        did = (7 << 32) | 1234
        rows = [
            {"url": "https://a.example/zz", "doc_id": did},
            {"url": "https://a.example/aa", "doc_id": did},   # collision
            {"url": "https://a.example/zz", "doc_id": did},   # true re-crawl
            {"url": "https://a.example/occupied", "doc_id": did + 1},
        ]
        out = dedup_recrawls_domain_group(_group(rows))
        assert out.num_rows == 3  # re-crawl dropped, collision kept
        ids = dict(zip(out["url"].to_pylist(), out["doc_id"].to_pylist()))
        # lexicographically smallest url keeps the original hash
        assert ids["https://a.example/aa"] == did
        # the other probes past the occupied did+1 slot to did+2
        assert ids["https://a.example/zz"] == did + 2
        assert ids["https://a.example/occupied"] == did + 1
        # domain bits untouched
        assert all(v >> 32 == 7 for v in ids.values())

    def test_probe_wraps_at_32_bits(self):
        from marginalia_ray.pipelines.domain_stage import dedup_recrawls_domain_group

        did = (7 << 32) | 0xFFFF_FFFF
        rows = [
            {"url": "https://a.example/b", "doc_id": did},
            {"url": "https://a.example/a", "doc_id": did},
        ]
        out = dedup_recrawls_domain_group(_group(rows))
        ids = dict(zip(out["url"].to_pylist(), out["doc_id"].to_pylist()))
        assert ids["https://a.example/a"] == did
        assert ids["https://a.example/b"] == (7 << 32) | 0  # wrapped low bits

    def test_no_collision_passthrough_zero_copy(self):
        from marginalia_ray.pipelines.domain_stage import dedup_recrawls_domain_group

        rows = [
            {"url": "https://a.example/x", "doc_id": (7 << 32) | 1},
            {"url": "https://a.example/y", "doc_id": (7 << 32) | 2},
        ]
        g = _group(rows)
        out = dedup_recrawls_domain_group(g)
        assert out is g


class TestRekeyCollision:
    def test_rekeyed_id_probes_past_existing_doc(self):
        """A doc re-keyed to an uncrawled canonical whose murmur32 equals an
        existing doc's low-32 id must NOT produce a duplicate 64-bit id."""
        from marginalia_ray.functions.hashing import murmur3_64

        canonical = "https://a.example/canonical-target"
        clash_low = murmur3_64(canonical.encode()) & 0xFFFF_FFFF
        rows = [
            # victim doc already occupies the hash slot the re-key wants
            {"url": "https://a.example/victim", "doc_id": (7 << 32) | clash_low},
            {"url": "https://a.example/claimer", "canonical": canonical,
             "doc_id": (7 << 32) | 12345},
        ]
        out = fix_canonicals_domain_group(_group(rows))
        ids = out["doc_id"].to_pylist()
        assert len(set(ids)) == 2, ids
        # the claimer probed to the next free slot, deterministically
        assert ids[1] == (7 << 32) | ((clash_low + 1) & 0xFFFF_FFFF)

    def test_rekey_without_collision_unchanged(self):
        from marginalia_ray.functions.hashing import murmur3_64

        canonical = "https://a.example/free-target"
        rows = [
            {"url": "https://a.example/a"},
            {"url": "https://a.example/claimer", "canonical": canonical},
        ]
        out = fix_canonicals_domain_group(_group(rows))
        expect = (7 << 32) | (murmur3_64(canonical.encode()) & 0xFFFF_FFFF)
        assert out["doc_id"].to_pylist()[1] == expect
