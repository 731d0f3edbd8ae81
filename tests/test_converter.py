"""Converter-stage tests: extraction byte-identity, disqualification,
LSH near-dup, and the end-to-end pages -> index -> query pipeline.

Mirrors the reference's ConvertingIntegrationTest strategy (SURVEY.md §5):
run the whole converter over a small corpus and assert state/title/text
invariants, then drive queries through the built index.
"""

import pyarrow as pa
import pytest

from marginalia_ray.functions.lsh import hamming
from marginalia_ray.sources.pages import make_page, make_pages_table
from marginalia_ray.stages.extract import extract_document
from marginalia_ray.stages.tokenizer import TokenizerStage

N = 300  # corpus size for these tests


def test_text_byte_identity():
    """BASELINE.json invariant: `text` column == extractor output, per url."""
    for i in range(0, 60):
        p = make_page(i, N)
        html = p["html"].decode("utf-8")
        assert extract_document(html).text == p["text"], f"row {i}"


def test_extraction_prunes_noise():
    p = make_page(2, N)
    text = p["text"]
    # nav links, cookie banner and footer must be pruned
    assert "We use cookies" not in text
    assert "Copyright" not in text


def test_noindex_and_language_disqualification():
    rows = [make_page(i, N) for i in (13, 17, 5)]  # 13: lang zz; 17: noindex
    t = pa.table(
        {
            "url": [r["url"] for r in rows],
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    out = TokenizerStage()(t)
    states = out["state"].to_pylist()
    assert states[0] == "LANGUAGE"
    assert states[1] == "ROBOTS_NOINDEX"
    assert states[2] == "OK"
    # disqualified rows carry no postings
    assert out["term_hashes"][0].as_py() == []


def test_near_duplicate_lsh():
    """Rows idx%40==7 near-duplicate the previous row: LSH hamming <= 2
    (LshDocumentDeduplicator threshold, ref LshDocumentDeduplicator.java:38-63)."""
    rows = [make_page(i, N) for i in (46, 47, 100)]
    t = pa.table(
        {
            "url": [r["url"] for r in rows],
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    out = TokenizerStage()(t)
    lshs = out["lsh"].to_pylist()
    assert hamming(lshs[0], lshs[1]) <= 2
    assert hamming(lshs[0], lshs[2]) > 2


def test_tokenizer_emits_rare_and_synthetic_terms():
    from marginalia_ray.functions.hashing import term_hash

    p = make_page(10, N)
    t = pa.table(
        {
            "url": [p["url"]],
            "html": pa.array([p["html"]], pa.binary()),
            "text": [p["text"]],
            "lang": [p["lang"]],
        }
    )
    out = TokenizerStage()(t)
    hashes = set(out["term_hashes"][0].as_py())
    assert term_hash("rare10term") in hashes
    domain = p["url"].split("/")[2]
    assert term_hash(f"site:{domain}") in hashes  # M11 synthetic


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    from marginalia_ray.pipelines.index_pipeline import run_index_pipeline
    from marginalia_ray.sources.pages import pages_parquet

    out = tmp_path_factory.mktemp("idx")
    pages = pages_parquet(N, cache_dir=str(tmp_path_factory.mktemp("pages")))
    manifest = run_index_pipeline(pages, str(out), n_shards=4, concurrency=2)
    return out, manifest


def test_pipeline_end_to_end(built_index):
    from marginalia_ray.query.engine import IndexSearcher

    out, manifest = built_index
    assert manifest["doc_count"] > N * 0.9  # few disqualified rows
    s = IndexSearcher(out)

    # per-doc rare term: exactly one hit
    r = s.search_words(["rare10term"])
    assert len(r) == 1

    # common terms: results ranked, domain-capped
    r = s.search_words(["search", "index"])
    assert 0 < len(r) <= 10
    assert all(a.score <= b.score for a, b in zip(r, r[1:]))  # lower = better

    # exclusion removes the rare doc
    rare_doc = s.search_words(["rare10term"])[0].combined_id
    r = s.search_words(["the", "term"], exclude=["rare10term"])
    assert rare_doc not in [x.combined_id for x in r]


def test_pipeline_resume_skips_converter(built_index):
    import time

    from marginalia_ray.pipelines.index_pipeline import run_index_pipeline

    out, _ = built_index
    pages_any = "/nonexistent"  # must not be read on resume
    t0 = time.time()
    m = run_index_pipeline(pages_any, str(out), build_id="build-resume", n_shards=4)
    assert m["convert_sec"] < 0.5  # converter skipped via _COMPLETE.json
    assert m["doc_count"] > 0
