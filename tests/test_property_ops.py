"""Property-based tests (hypothesis) for the distributed curation /
relational / sketch operators: each op is compared against a serial
pure-Python reference implementation on randomized inputs.  Examples are
kept small (each one executes a Ray Data pipeline)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield

WORDS = ["alpha", "beta", "gamma", "delta", "run", "the", "x9"]

texts = st.lists(
    st.lists(st.sampled_from(WORDS), max_size=12).map(" ".join),
    min_size=1,
    max_size=25,
)


def _docs_ds(texts_list):
    import ray.data

    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts_list)]
    )


@given(texts, st.integers(min_value=1, max_value=50))
@settings(max_examples=12, deadline=None)
def test_token_budget_pack_matches_serial(texts_list, budget):
    from marginalia_ray.ops.curation import token_budget_pack

    out = {
        r["doc_id"]: r
        for r in token_budget_pack(_docs_ds(texts_list), budget=budget,
                                   n_buckets=4).take_all()
    }
    cum = 0
    for i, t in enumerate(texts_list):
        n_tok = len(t.split())
        assert out[i]["n_tokens"] == n_tok
        assert out[i]["bin"] == cum // budget
        cum += n_tok


@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40))
@settings(max_examples=15, deadline=None)
def test_length_percentile_matches_serial(vals):
    import ray.data

    from marginalia_ray.ops.curation import length_percentile

    ds = ray.data.from_items(
        [{"doc_id": i, "n_chars": v} for i, v in enumerate(vals)]
    )
    out = {r["doc_id"]: r for r in length_percentile(ds, lo=0.2, hi=0.8).take_all()}
    denom = max(len(vals) - 1, 1)
    for i, v in enumerate(vals):
        below = sum(1 for x in vals if x < v)
        pct = round(below / denom, 6)
        assert out[i]["pct_rank"] == pct
        assert out[i]["keep"] == (1 if 0.2 <= pct <= 0.8 else 0)


@given(texts, st.integers(min_value=1, max_value=3))
@settings(max_examples=10, deadline=None)
def test_sentence_dedup_matches_serial(texts_list, max_docs):
    from marginalia_ray.ops.curation import sentence_dedup

    # '.'-join pairs of words into sentences
    dec = [t.replace(" ", ". ", 1) for t in texts_list]
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(dec)]
    )
    out = {r["doc_id"]: r for r in sentence_dedup(ds, max_docs=max_docs).take_all()}
    # serial reference
    split = {i: [s.strip() for s in t.split(".")] for i, t in enumerate(dec)}
    df = {}
    for i, sents in split.items():
        for s in set(x for x in sents if x):
            df[s] = df.get(s, 0) + 1
    hot = {s for s, c in df.items() if c > max_docs}
    for i, sents in split.items():
        kept = [s for s in sents if s and s not in hot]
        n_sent = sum(1 for s in sents if s)
        assert out[i]["clean_text"] == ". ".join(kept)
        assert out[i]["n_kept"] == len(kept)
        assert out[i]["n_removed"] == n_sent - len(kept)


@given(texts)
@settings(max_examples=10, deadline=None)
def test_bigram_perplexity_matches_serial(texts_list):
    from marginalia_ray.ops.curation import bigram_perplexity

    out = {r["doc_id"]: r for r in bigram_perplexity(_docs_ds(texts_list)).take_all()}
    toks = {i: t.split() for i, t in enumerate(texts_list)}
    uni: dict = {}
    bi: dict = {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    for i, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        assert out[i]["n_bigrams"] == len(pairs)
        if pairs:
            nll = -sum(
                math.log((bi[p] + 1) / (uni[p[0]] + V)) for p in pairs
            ) / len(pairs)
            assert abs(out[i]["nll"] - round(nll, 6)) <= 1e-6
        else:
            assert out[i]["nll"] == 0.0


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60,
             unique=True),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_stratified_sample_matches_serial(ids, n):
    import ray.data

    from marginalia_ray.ops.curation import stratified_sample_n
    from marginalia_ray.ops.text_ops import _FMIX_SPLIT

    ds = ray.data.from_items(
        [{"doc_id": i, "lang": "en" if i % 2 else "de"} for i in ids]
    )
    out = stratified_sample_n(ds, key_col="lang", n=n).take_all()
    h = {i: int(_FMIX_SPLIT(np.array([i], np.uint64))[0]) for i in ids}
    for lang in ("en", "de"):
        members = sorted((i for i in ids if (i % 2 == 1) == (lang == "en")),
                         key=lambda i: (h[i], i))
        expect = members[:n]
        got = sorted((r["doc_id"] for r in out if r["lang"] == lang),
                     key=lambda i: (h[i], i))
        assert got == expect


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),   # key
                  st.integers(min_value=0, max_value=20)),  # value
        min_size=1, max_size=60,
    )
)
@settings(max_examples=15, deadline=None)
def test_median_by_key_matches_serial(pairs):
    import ray.data
    import statistics

    from marginalia_ray.ops.relational import median_by_key

    ds = ray.data.from_items([{"k": f"k{a}", "v": b} for a, b in pairs])
    out = {r["k"]: r for r in median_by_key(ds, key_col="k", val_col="v").take_all()}
    by_key: dict = {}
    for a, b in pairs:
        by_key.setdefault(f"k{a}", []).append(b)
    for k, vals in by_key.items():
        assert out[k]["n"] == len(vals)
        assert out[k]["median"] == float(statistics.median(vals))
