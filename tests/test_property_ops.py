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


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from(["en", "de", "fr", "zh"])),
        min_size=1, max_size=50, unique_by=lambda t: t[0],
    ),
    st.dictionaries(st.sampled_from(["en", "de", "fr"]),
                    st.integers(1, 3), min_size=1, max_size=3),
)
@settings(max_examples=12, deadline=None)
def test_mixture_sample_matches_serial(rows, weights):
    import ray.data

    from marginalia_ray.ops.curation import mixture_sample
    from marginalia_ray.ops.text_ops import _FMIX_SPLIT

    ds = ray.data.from_items([{"doc_id": i, "lang": l} for i, l in rows])
    out = mixture_sample(ds, weights, key_col="lang").take_all()

    counts = {}
    for _, l in rows:
        counts[l] = counts.get(l, 0) + 1
    t = min(counts.get(k, 0) // w for k, w in weights.items())
    targets = {k: w * t for k, w in weights.items()}
    # serial reference: per key, the target_k ids with smallest (fmix, id)
    expect = set()
    for k, tgt in targets.items():
        ids = sorted(
            (i for i, l in rows if l == k),
            key=lambda i: (int(_FMIX_SPLIT(np.array([i], np.uint64))[0]), i),
        )[:tgt]
        expect.update((i, k) for i in ids)
    assert {(r["doc_id"], r["lang"]) for r in out} == expect


@given(
    st.lists(st.tuples(st.integers(0, 2_000), st.sampled_from("ab"),
                       st.floats(-5, 5, allow_nan=False)),
             min_size=1, max_size=40),
    st.integers(1, 90),
    st.integers(1, 90),
)
@settings(max_examples=12, deadline=None)
def test_hopping_window_matches_serial(rows, width, hop):
    import pyarrow as pa
    import ray.data

    from marginalia_ray.ops.relational import hopping_window

    TS0 = 1_700_000_000_000_000
    ds = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([TS0 + m * 60_000_000 for m, _, _ in rows],
                               pa.timestamp("us")),
                "event_type": pa.array([k for _, k, _ in rows]),
                "value": pa.array([v for _, _, v in rows], pa.float64()),
            }
        )
    )
    out = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in hopping_window(ds, width_minutes=width, hop_minutes=hop).take_all()
    }
    w_us, h_us = width * 60_000_000, hop * 60_000_000
    k = -(-w_us // h_us)
    expect = {}
    for m, key, v in rows:
        us = TS0 + m * 60_000_000
        for j in range(k):
            ws = (us // h_us - j) * h_us
            if us < ws + w_us:
                n, s = expect.get((ws, key), (0, 0))
                expect[(ws, key)] = (n + 1, s + int(np.round(v * 1e6)))
    expect = {kk: (n, np.round(s / 1e6, 6)) for kk, (n, s) in expect.items()}
    assert out == expect


@given(
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)),
             min_size=1, max_size=30),
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)),
             min_size=1, max_size=30),
)
@settings(max_examples=12, deadline=None)
def test_hash_equi_join_matches_serial(lrows, rrows):
    import pyarrow as pa
    import ray.data

    from marginalia_ray.ops.relational import hash_equi_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([k for k, _ in lrows], pa.int64()),
                  "lv": pa.array([v for _, v in lrows], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([k for k, _ in rrows], pa.int64()),
                  "rv": pa.array([v for _, v in rrows], pa.int64())})
    )
    inner = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in hash_equi_join(left, right, on="k").take_all()
    )
    expect = sorted(
        (lk, lv, rv) for lk, lv in lrows for rk, rv in rrows if lk == rk
    )
    assert inner == expect
    leftj = sorted(
        (r["k"], r["lv"], r["rv"] if r["rv"] is not None else -1)
        for r in hash_equi_join(left, right, on="k", how="left").take_all()
    )
    expect_l = []
    rkeys = {k for k, _ in rrows}
    for lk, lv in lrows:
        if lk in rkeys:
            expect_l.extend((lk, lv, rv) for rk, rv in rrows if rk == lk)
        else:
            expect_l.append((lk, lv, -1))
    assert leftj == sorted(expect_l)


@given(texts)
@settings(max_examples=12, deadline=None)
def test_token_entropy_matches_serial(texts_list):
    from collections import Counter

    from marginalia_ray.ops.text_ops import token_entropy

    out = {r["doc_id"]: r for r in token_entropy(_docs_ds(texts_list)).take_all()}
    for i, t in enumerate(texts_list):
        toks = [w for w in t.lower().split() if w]
        c = Counter(toks)
        n = sum(c.values())
        if n == 0:
            assert out[i]["entropy"] == 0.0 and out[i]["n_tokens"] == 0
            continue
        q = sum(int(np.floor((v / n) * np.log(v / n) * 1e9 + 0.5)) for v in c.values())
        h = np.floor(-q / 1e9 * 1e6 + 0.5) / 1e6 + 0.0
        assert out[i]["n_tokens"] == n
        assert out[i]["n_distinct"] == len(c)
        assert out[i]["entropy"] == h


@given(texts)
@settings(max_examples=10, deadline=None)
def test_ngram_novelty_matches_serial(texts_list):
    from collections import Counter

    from marginalia_ray.ops.dedup import ngram_novelty

    out = {r["doc_id"]: r for r in ngram_novelty(_docs_ds(texts_list)).take_all()}
    per_doc = []
    for t in texts_list:
        toks = t.lower().split()
        per_doc.append({" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)})
    df = Counter(s for grams in per_doc for s in grams)
    for i, grams in enumerate(per_doc):
        if not grams:
            assert i not in out
            continue
        uniq = sum(1 for s in grams if df[s] == 1)
        assert out[i]["n_shingles"] == len(grams)
        assert out[i]["n_unique"] == uniq
        assert out[i]["novelty"] == np.floor(uniq / len(grams) * 1e6 + 0.5) / 1e6


@given(texts)
@settings(max_examples=10, deadline=None)
def test_containment_pairs_matches_serial(texts_list):
    from marginalia_ray.ops.dedup import containment_pairs

    got = {
        (r["doc_a"], r["doc_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
        for r in containment_pairs(_docs_ds(texts_list), threshold=0.3,
                                   n=2).take_all()
    }

    def shingles(t):
        ws = t.split()
        return {tuple(ws[i : i + 2]) for i in range(len(ws) - 1)}

    want = {}
    sh = [shingles(t) for t in texts_list]
    for a in range(len(texts_list)):
        for b in range(a + 1, len(texts_list)):
            if not sh[a] or not sh[b]:
                continue
            i = len(sh[a] & sh[b])
            if i == 0:
                continue
            c_ab = round(i / len(sh[a]), 6)
            c_ba = round(i / len(sh[b]), 6)
            if max(c_ab, c_ba) >= 0.3:
                want[(a, b)] = (c_ab, c_ba)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


@given(texts, st.integers(min_value=1, max_value=6))
@settings(max_examples=10, deadline=None)
def test_winnow_fingerprints_matches_serial(texts_list, ww):
    from marginalia_ray.ops.text_ops import (
        _FP_MASK,
        _FP_WIN_BASE,
        _FP_WINDOW,
        _token_value_mod32,
        winnow_fingerprints,
    )
    import pyarrow as pa

    got = {}
    for r in winnow_fingerprints(_docs_ds(texts_list),
                                 winnow_window=ww).take_all():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])

    # serial winnowing reference: per-window rightmost argmin, python loops
    want = {}
    for i, t in enumerate(texts_list):
        toks = [w for w in t.split() if w]
        if not toks:
            continue
        tv = [int(v) for v in _token_value_mod32(pa.array(toks))]
        W, B, MASK = _FP_WINDOW, int(_FP_WIN_BASE), int(_FP_MASK)
        if len(tv) < W:
            g = 0
            for v in tv:
                g = (g * B + v) & MASK
            grams = [g]
        else:
            grams = []
            for s in range(len(tv) - W + 1):
                g = 0
                for v in tv[s : s + W]:
                    g = (g * B + v) & MASK
                grams.append(g)
        m = len(grams)
        sel = set()
        if m <= ww:
            mn = min(grams)
            sel.add(max(p for p in range(m) if grams[p] == mn))
        else:
            for s in range(m - ww + 1):
                window = grams[s : s + ww]
                mn = min(window)
                sel.add(s + max(p for p in range(ww) if window[p] == mn))
        want[i] = {grams[p] for p in sel}
    assert got == want


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 100)),
        min_size=1,
        max_size=40,
    ),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
@settings(max_examples=12, deadline=None)
def test_quantile_by_key_matches_numpy(pairs, q):
    import ray.data

    from marginalia_ray.ops.relational import quantile_by_key

    ds = ray.data.from_items(
        [{"source": k, "n_chars": v} for k, v in pairs]
    )
    out = {r["source"]: r for r in quantile_by_key(ds, q=q).take_all()}
    by_key = {}
    for k, v in pairs:
        by_key.setdefault(k, []).append(v)
    for k, vals in by_key.items():
        assert out[k]["n"] == len(vals)
        want = round(float(np.quantile(np.array(vals, dtype=np.float64), q)), 6)
        assert out[k][f"q{int(round(q * 100))}"] == pytest.approx(want, abs=1e-6)


@given(texts, texts)
@settings(max_examples=10, deadline=None)
def test_novel_against_corpus_matches_set_logic(new_texts, seen_texts):
    import ray.data

    from marginalia_ray.ops.dedup import novel_against_corpus

    new = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(new_texts)]
    )
    seen = ray.data.from_items(
        [{"doc_id": 1000 + i, "text": t} for i, t in enumerate(seen_texts)]
    )
    got = sorted(r["doc_id"] for r in novel_against_corpus(new, seen).take_all())
    seen_set = set(seen_texts)
    want = sorted(i for i, t in enumerate(new_texts) if t not in seen_set)
    assert got == want


@given(texts)
@settings(max_examples=10, deadline=None)
def test_pmi_matches_serial_counter(texts_list):
    from collections import Counter

    from marginalia_ray.ops.curation import pmi_collocations

    out = pmi_collocations(_docs_ds(texts_list), min_count=1, k=10_000).take_all()
    got = {(r["w1"], r["w2"]): (r["c_xy"], r["pmi"]) for r in out}
    uni, big = Counter(), Counter()
    for t in texts_list:
        toks = t.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n, m = float(sum(uni.values())), float(sum(big.values()))
    want = {
        (w1, w2): (c, round(math.log((c * n * n) / (m * uni[w1] * uni[w2])), 6))
        for (w1, w2), c in big.items()
    }
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    for key, (_, p) in want.items():
        assert got[key][1] == pytest.approx(p, abs=1e-6)


@given(texts, st.integers(min_value=2, max_value=8))
@settings(max_examples=10, deadline=None)
def test_heavy_hitters_matches_serial(texts_list, den):
    from collections import Counter

    from marginalia_ray.ops.sketch import heavy_hitters

    got = {
        r["term"]: r["cnt"]
        for r in heavy_hitters(_docs_ds(texts_list), num=1, den=den).take_all()
    }
    counts = Counter(w for t in texts_list for w in t.split())
    n = sum(counts.values())
    want = {t: c for t, c in counts.items() if c * den >= n}
    assert got == want


@given(texts, st.integers(min_value=2, max_value=4))
@settings(max_examples=10, deadline=None)
def test_substring_dedup_apply_matches_serial(texts_list, window):
    from marginalia_ray.ops.dedup import substring_dedup_apply

    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in substring_dedup_apply(_docs_ds(texts_list), window=window).take_all()
    }
    toks = [t.split() for t in texts_list]
    # windows -> set of docs containing each
    win_docs = {}
    for d, ts in enumerate(toks):
        for i in range(len(ts) - window + 1):
            win_docs.setdefault(tuple(ts[i : i + window]), set()).add(d)
    dup = {w for w, ds_ in win_docs.items() if len(ds_) >= 2}
    for d, ts in enumerate(toks):
        covered = [False] * len(ts)
        for i in range(len(ts) - window + 1):
            if tuple(ts[i : i + window]) in dup:
                for j in range(i, i + window):
                    covered[j] = True
        kept = [t for t, c in zip(ts, covered) if not c]
        assert got[d] == (" ".join(kept), len(kept), len(ts) - len(kept)), (
            f"doc {d} window {window}"
        )


@given(texts, st.integers(min_value=2, max_value=6),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=10, deadline=None)
def test_chunk_documents_matches_serial(texts_list, chunk, overlap):
    from marginalia_ray.ops.text_ops import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    out = chunk_documents(
        _docs_ds(texts_list), chunk_tokens=chunk, overlap=overlap
    ).take_all()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            r["chunk_text"], r["n_tokens"]
        )
    for d, t in enumerate(texts_list):
        ts = t.split()
        want = {}
        c = 0
        while c * step < len(ts):
            piece = ts[c * step : c * step + chunk]
            want[c] = (" ".join(piece), len(piece))
            if c * step + chunk >= len(ts):
                break
            c += 1
        assert got.get(d, {}) == want, f"doc {d}"
