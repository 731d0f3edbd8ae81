"""Unit tests for the round-3 training-data ops: PII scrubbing,
deterministic hash split, per-doc TF-IDF top-k, exact-substring pairs."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def mini_docs(ray_session):
    import ray.data

    rows = [
        {"doc_id": 1, "text": "mail me at bob.smith+x@foo-bar.org or 555-123-4567 now"},
        {"doc_id": 2, "text": "server 192.168.10.255 and admin@example.com and 10.0.0.1"},
        {"doc_id": 3, "text": "no pii here just plain words"},
        {"doc_id": 4, "text": ""},
    ]
    return ray.data.from_items(rows)


def test_pii_scrub_counts_and_replacement(mini_docs):
    from marginalia_ray.ops.text_ops import pii_scrub

    out = {r["doc_id"]: r for r in pii_scrub(mini_docs).take_all()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1 and out[1]["n_ip"] == 0
    assert "<EMAIL>" in out[1]["clean_text"] and "<PHONE>" in out[1]["clean_text"]
    assert "bob.smith" not in out[1]["clean_text"]
    assert out[2]["n_ip"] == 2 and out[2]["n_email"] == 1
    assert out[2]["clean_text"].count("<IP>") == 2
    assert out[3]["clean_text"] == out[3]["clean_text"] and out[3]["n_email"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_phone"] == 0


def test_hash_split_deterministic_and_complete(ray_session):
    import ray.data

    from marginalia_ray.ops.text_ops import _FMIX_SPLIT, hash_split

    ids = list(range(2000))
    ds = ray.data.from_items([{"doc_id": i, "text": "x"} for i in ids])
    rows = hash_split(ds).take_all()
    assert len(rows) == len(ids)
    by_split = {}
    for r in rows:
        # bucket is the pure fmix64 function of the id — stable across runs
        # (modulus as np.uint64: uint64 % python-int promotes to float64)
        exp = int(_FMIX_SPLIT(np.array([r["doc_id"]], dtype=np.uint64))[0] % np.uint64(100))
        assert r["bucket"] == exp
        by_split.setdefault(r["split"], 0)
        by_split[r["split"]] += 1
    # 80/10/10 within a loose tolerance at n=2000
    assert 0.74 <= by_split["train"] / len(ids) <= 0.86
    assert by_split["train"] + by_split["valid"] + by_split["test"] == len(ids)


def test_tfidf_topk_ranks_and_cap(ray_session):
    import ray.data

    from marginalia_ray.ops.text_ops import tfidf_topk

    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "apple apple banana common"},
            {"doc_id": 2, "text": "banana cherry common"},
            {"doc_id": 3, "text": "common common cherry"},
        ]
    )
    rows = tfidf_topk(ds, k=2).take_all()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in per_doc.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 2
    # doc 1's top term is the doc-unique 'apple' (tf=2, df=1)
    top1 = min(per_doc[1], key=lambda r: r["rank"])
    assert top1["term"] == "apple" and top1["tf"] == 2
    # 'common' appears in all docs -> idf 0 -> never outranks a rarer term
    assert all(r["term"] != "common" or r["tfidf"] == 0.0 for r in rows)

    with pytest.raises(ValueError, match="max_vocab"):
        tfidf_topk(ds, k=2, max_vocab=2).take_all()


def test_exact_substring_pairs_window_semantics(ray_session):
    import ray.data

    from marginalia_ray.ops.dedup import exact_substring_pairs

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": f"prefix {shared} suffix a"},
            {"doc_id": 2, "text": f"other start {shared} tail words here"},
            {"doc_id": 3, "text": "totally different content with no overlap at all ok"},
            {"doc_id": 4, "text": "short doc"},  # < window: emits nothing
        ]
    )
    rows = exact_substring_pairs(ds).take_all()
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in rows}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == 1  # exactly the one shared window


def test_exact_substring_pairs_hot_gram_cap(ray_session):
    import ray.data

    from marginalia_ray.ops.dedup import exact_substring_pairs

    boiler = "the same eight token boilerplate line repeats here"
    ds = ray.data.from_items(
        [{"doc_id": i, "text": boiler} for i in range(5)]
    )
    # the only gram is shared by 5 docs > max_group=3 -> skipped entirely
    assert exact_substring_pairs(ds, max_docs_per_gram=3).take_all() == []
    # raising the cap brings back all C(5,2)=10 pairs
    assert len(exact_substring_pairs(ds, max_docs_per_gram=10).take_all()) == 10


def test_c4_filter_rules(ray_session):
    import ray.data

    from marginalia_ray.ops.text_ops import c4_filter

    good = "this line has plenty of words and ends properly."
    rows = [
        # 3 good lines -> kept page
        {"doc_id": 1, "text": f"{good}\n{good}\n{good}"},
        # only 2 good lines -> dropped page (min 3)
        {"doc_id": 2, "text": f"{good}\n{good}\nno punct line here ok"},
        # javascript line filtered; page has brace -> dropped
        {"doc_id": 3, "text": f"{good}\nenable JavaScript to view this page.\nx {{ y"},
        # lorem ipsum poison -> dropped even with 3 good lines
        {"doc_id": 4, "text": f"{good}\n{good}\n{good}\nlorem ipsum"},
        # short line (<5 words) filtered
        {"doc_id": 5, "text": f"{good}\ntoo short.\n{good}\n{good}"},
    ]
    out = {r["doc_id"]: r for r in c4_filter(ray.data.from_items(rows)).take_all()}
    assert out[1]["keep"] == 1 and out[1]["n_kept"] == 3 and out[1]["n_total"] == 3
    assert out[1]["clean_text"] == f"{good}\n{good}\n{good}"
    assert out[2]["keep"] == 0 and out[2]["n_kept"] == 2
    assert out[3]["keep"] == 0  # brace page
    assert out[3]["n_kept"] == 1  # javascript line dropped (case-insensitive)
    assert out[4]["keep"] == 0  # lorem ipsum page
    assert out[5]["keep"] == 1 and out[5]["n_kept"] == 3 and out[5]["n_total"] == 4
