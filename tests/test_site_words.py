"""SiteWords (J7) unit tests: common-site-word Site flags and link-graph
SiteAdjacent flags (ref SiteWords.java:24-74,
CommonKeywordExtractor.java:19-70)."""

import pyarrow as pa

from marginalia_ray.functions.hashing import term_hash
from marginalia_ray.model.codecs import WordFlags
from marginalia_ray.pipelines.domain_stage import (
    _common_site_words,
    site_words_domain_group,
)


def _group(rows):
    return pa.table(
        {
            "doc_id": pa.array([r.get("doc_id", i) for i, r in enumerate(rows)], pa.uint64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "state": pa.array([r.get("state", "OK") for r in rows], pa.string()),
            "links": pa.array([r.get("links", []) for r in rows], pa.list_(pa.string())),
            "flag_words": pa.array([r.get("flag_words", []) for r in rows], pa.list_(pa.string())),
            "top_words": pa.array([r.get("top_words", []) for r in rows], pa.list_(pa.string())),
            "term_hashes": pa.array([r.get("th", []) for r in rows], pa.list_(pa.uint64())),
            "kw_metas": pa.array([r.get("km", []) for r in rows], pa.list_(pa.uint64())),
        }
    )


def test_common_site_words_thresholds():
    # under 25 docs -> nothing
    assert _common_site_words([["acme"]] * 24) == set()
    # 30 docs, "acme" in most -> selected
    docs = [["acme", f"unique{i}"] for i in range(30)]
    out = _common_site_words(docs)
    assert "acme" in out
    assert not any(w.startswith("unique") for w in out)


def test_site_flag_applied_to_all_docs():
    rows = [
        {"url": f"https://d.example/{i}", "flag_words": ["acme"], "th": [1], "km": [0]}
        for i in range(30)
    ]
    out = site_words_domain_group(_group(rows))
    h = term_hash("acme")
    for i in range(30):
        th = out["term_hashes"][i].as_py()
        km = out["kw_metas"][i].as_py()
        assert h in th
        assert km[th.index(h)] & WordFlags.Site.bit


def test_site_adjacent_via_link_graph():
    target = "https://d.example/target"
    rows = [
        {
            "url": f"https://d.example/src{i}",
            "links": [target],
            "top_words": ["widget"],
        }
        for i in range(5)
    ] + [
        {
            "url": target,
            "top_words": ["widget", "other"],
            "th": [term_hash("widget")],
            "km": [0],
        }
    ]
    out = site_words_domain_group(_group(rows))
    km = out["kw_metas"][5].as_py()
    th = out["term_hashes"][5].as_py()
    assert km[th.index(term_hash("widget"))] & WordFlags.SiteAdjacent.bit
    # "other" was not in any linking doc -> unflagged
    assert term_hash("other") not in th or not (
        km[th.index(term_hash("other"))] & WordFlags.SiteAdjacent.bit
    )


def test_adjacent_requires_more_than_three_linkers():
    target = "https://d.example/t"
    rows = [
        {"url": f"https://d.example/s{i}", "links": [target], "top_words": ["w"]}
        for i in range(3)  # only 3 linkers -> not > 3
    ] + [{"url": target, "top_words": ["w"], "th": [term_hash("w")], "km": [0]}]
    out = site_words_domain_group(_group(rows))
    km = out["kw_metas"][3].as_py()
    assert not (km[0] & WordFlags.SiteAdjacent.bit)
