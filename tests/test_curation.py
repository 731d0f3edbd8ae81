"""Unit tests for the corpus-curation operators (ops/curation.py):
decontaminate, token_budget_pack, length_percentile, sentence_dedup."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


class TestDecontaminate:
    def test_planted_overlap(self, ray_session):
        from marginalia_ray.ops.curation import decontaminate

        passage = "a b c d e f g h"  # exactly one 8-gram
        rows = [
            {"doc_id": 1, "text": f"x y z {passage} q r"},  # contaminated
            {"doc_id": 2, "text": "totally different words here with no overlap at all"},
            {"doc_id": 3, "text": passage},  # exact benchmark doc
        ]
        bench = _ds([{"doc_id": 100, "text": passage}])
        out = {r["doc_id"]: r for r in decontaminate(_ds(rows), bench, n=8).take_all()}
        assert out[1]["contaminated"] == 1 and out[1]["n_hits"] == 1
        assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0
        assert out[3]["contaminated"] == 1

    def test_short_docs_never_match(self, ray_session):
        from marginalia_ray.ops.curation import decontaminate

        rows = [{"doc_id": 1, "text": "only three words"}]
        bench = _ds([{"doc_id": 9, "text": "only three words"}])
        out = decontaminate(_ds(rows), bench, n=8).take_all()
        assert out[0]["n_hits"] == 0  # both sides too short for an 8-gram

    def test_bench_cap(self, ray_session):
        from marginalia_ray.ops.curation import decontaminate

        bench = _ds([{"doc_id": 1, "text": " ".join(f"w{i}" for i in range(200))}])
        with pytest.raises(RuntimeError, match="distinct grams"):
            decontaminate(_ds([{"doc_id": 2, "text": "x"}]), bench, n=2,
                          max_bench_grams=10).take_all()


class TestTokenBudgetPack:
    def test_matches_serial_prefix_sum(self, ray_session):
        from marginalia_ray.ops.curation import token_budget_pack

        rng = np.random.default_rng(7)
        rows = [
            {"doc_id": int(i), "text": " ".join(["tok"] * int(rng.integers(1, 40)))}
            for i in range(300)
        ]
        out = sorted(
            token_budget_pack(_ds(rows), budget=100, n_buckets=8).take_all(),
            key=lambda r: r["doc_id"],
        )
        cum = 0
        for r in out:
            assert r["bin"] == cum // 100
            cum += r["n_tokens"]

    def test_bucket_overflow_raises(self, ray_session):
        from marginalia_ray.ops.curation import token_budget_pack

        rows = [{"doc_id": i, "text": "a b"} for i in range(50)]
        with pytest.raises(Exception, match="range bucket"):
            token_budget_pack(_ds(rows), budget=10, n_buckets=1,
                              max_bucket_docs=10).take_all()


class TestLengthPercentile:
    def test_percent_rank_with_ties(self, ray_session):
        from marginalia_ray.ops.curation import length_percentile

        # values: 10,10,20,30 -> pct ranks 0,0,2/3,1
        rows = [
            {"doc_id": 1, "n_chars": 10},
            {"doc_id": 2, "n_chars": 10},
            {"doc_id": 3, "n_chars": 20},
            {"doc_id": 4, "n_chars": 30},
        ]
        out = {r["doc_id"]: r for r in
               length_percentile(_ds(rows), lo=0.0, hi=0.9).take_all()}
        assert out[1]["pct_rank"] == 0.0 and out[2]["pct_rank"] == 0.0
        assert out[3]["pct_rank"] == round(2 / 3, 6)
        assert out[4]["pct_rank"] == 1.0
        assert out[4]["keep"] == 0 and out[3]["keep"] == 1

    def test_single_row(self, ray_session):
        from marginalia_ray.ops.curation import length_percentile

        out = length_percentile(_ds([{"doc_id": 1, "n_chars": 5}])).take_all()
        assert out[0]["pct_rank"] == 0.0 and out[0]["keep"] == 0  # 0.0 < lo=0.05


class TestSentenceDedup:
    def test_hot_sentence_removed_order_kept(self, ray_session):
        from marginalia_ray.ops.curation import sentence_dedup

        boiler = "subscribe now"
        rows = [
            {"doc_id": i, "text": f"unique sentence {i}. {boiler}. tail {i}"}
            for i in range(5)
        ]
        out = {r["doc_id"]: r for r in
               sentence_dedup(_ds(rows), max_docs=3).take_all()}
        for i in range(5):
            assert out[i]["clean_text"] == f"unique sentence {i}. tail {i}"
            assert out[i]["n_kept"] == 2 and out[i]["n_removed"] == 1

    def test_below_threshold_untouched(self, ray_session):
        from marginalia_ray.ops.curation import sentence_dedup

        rows = [{"doc_id": i, "text": "shared. own %d" % i} for i in range(3)]
        out = sentence_dedup(_ds(rows), max_docs=3).take_all()
        assert all(r["n_removed"] == 0 for r in out)  # 3 docs is not > 3

    def test_empty_and_all_removed(self, ray_session):
        from marginalia_ray.ops.curation import sentence_dedup

        rows = [{"doc_id": i, "text": "gone"} for i in range(4)] + [
            {"doc_id": 9, "text": ""}
        ]
        out = {r["doc_id"]: r for r in sentence_dedup(_ds(rows), max_docs=3).take_all()}
        assert out[0]["clean_text"] == "" and out[0]["n_removed"] == 1
        assert out[9]["clean_text"] == "" and out[9]["n_kept"] == 0 and out[9]["n_removed"] == 0


class TestBigramPerplexity:
    def test_matches_hand_computation(self, ray_session):
        import math

        from marginalia_ray.ops.curation import bigram_perplexity

        # corpus: "a b", "a b", "a c" -> V=3
        # C(a)=3, C(a b)=2, C(a c)=1
        rows = [
            {"doc_id": 1, "text": "a b"},
            {"doc_id": 2, "text": "a b"},
            {"doc_id": 3, "text": "a c"},
            {"doc_id": 4, "text": "solo"},  # no bigrams
        ]
        out = {r["doc_id"]: r for r in bigram_perplexity(_ds(rows)).take_all()}
        nll_ab = -math.log((2 + 1) / (3 + 4))  # V=4 (a,b,c,solo)
        nll_ac = -math.log((1 + 1) / (3 + 4))
        assert out[1]["n_bigrams"] == 1 and out[1]["nll"] == round(nll_ab, 6)
        assert out[2]["nll"] == out[1]["nll"]
        assert out[3]["nll"] == round(nll_ac, 6)
        assert out[4]["n_bigrams"] == 0 and out[4]["nll"] == 0.0
        # rarer continuation => higher surprise
        assert out[3]["nll"] > out[1]["nll"]

    def test_vocab_cap(self, ray_session):
        import pytest

        from marginalia_ray.ops.curation import bigram_perplexity

        rows = [{"doc_id": 1, "text": " ".join(f"w{i}" for i in range(100))}]
        with pytest.raises(RuntimeError, match="vocabulary"):
            bigram_perplexity(_ds(rows), max_vocab=10).take_all()


class TestStratifiedSampleN:
    def test_exact_n_and_determinism(self, ray_session):
        from marginalia_ray.ops.curation import stratified_sample_n

        rows = [
            {"doc_id": i, "lang": "en" if i % 3 else "de"} for i in range(60)
        ]
        a = sorted(
            stratified_sample_n(_ds(rows), key_col="lang", n=5).take_all(),
            key=lambda r: (r["lang"], r["rk"]),
        )
        b = sorted(
            stratified_sample_n(_ds(rows), key_col="lang", n=5).take_all(),
            key=lambda r: (r["lang"], r["rk"]),
        )
        assert a == b  # pure function of ids
        langs = {}
        for r in a:
            langs.setdefault(r["lang"], []).append(r["rk"])
        assert langs == {"en": [1, 2, 3, 4, 5], "de": [1, 2, 3, 4, 5]}

    def test_small_stratum_returns_all(self, ray_session):
        from marginalia_ray.ops.curation import stratified_sample_n

        rows = [{"doc_id": 1, "lang": "fr"}, {"doc_id": 2, "lang": "fr"}]
        out = stratified_sample_n(_ds(rows), key_col="lang", n=5).take_all()
        assert len(out) == 2 and {r["rk"] for r in out} == {1, 2}

    def test_matches_global_fmix_order(self, ray_session):
        import numpy as np

        from marginalia_ray.ops.curation import stratified_sample_n
        from marginalia_ray.ops.text_ops import _FMIX_SPLIT

        rows = [{"doc_id": i, "lang": "en"} for i in range(40)]
        out = stratified_sample_n(_ds(rows), key_col="lang", n=3).take_all()
        ids = np.arange(40, dtype=np.uint64)
        h = _FMIX_SPLIT(ids)
        expect = set(np.array(sorted(range(40), key=lambda i: (h[i], i)))[:3].tolist())
        assert {r["doc_id"] for r in out} == expect


class TestMixtureSample:
    def test_exact_ratio_and_determinism(self, ray_session):
        from marginalia_ray.ops.curation import mixture_sample

        # 40 en, 21 de, 9 fr -> T = min(40//2, 21//1, 9//1) = 9
        rows = (
            [{"doc_id": i, "lang": "en"} for i in range(40)]
            + [{"doc_id": 100 + i, "lang": "de"} for i in range(21)]
            + [{"doc_id": 200 + i, "lang": "fr"} for i in range(9)]
            + [{"doc_id": 300 + i, "lang": "zh"} for i in range(7)]
        )
        w = {"en": 2, "de": 1, "fr": 1}
        a = sorted(
            mixture_sample(_ds(rows), w).take_all(),
            key=lambda r: (r["lang"], r["rk"]),
        )
        b = sorted(
            mixture_sample(_ds(rows), w).take_all(),
            key=lambda r: (r["lang"], r["rk"]),
        )
        assert a == b  # pure function of ids
        sizes = {}
        for r in a:
            sizes[r["lang"]] = sizes.get(r["lang"], 0) + 1
        assert sizes == {"en": 18, "de": 9, "fr": 9}  # exact 2:1:1, zh dropped
        # rk is 1..target_k per key
        for lang, tgt in (("en", 18), ("de", 9), ("fr", 9)):
            assert sorted(r["rk"] for r in a if r["lang"] == lang) == list(
                range(1, tgt + 1)
            )

    def test_binding_key_keeps_all_rows(self, ray_session):
        from marginalia_ray.ops.curation import mixture_sample

        rows = [{"doc_id": i, "lang": "en"} for i in range(10)] + [
            {"doc_id": 50 + i, "lang": "de"} for i in range(5)
        ]
        out = mixture_sample(_ds(rows), {"en": 2, "de": 1}).take_all()
        de = {r["doc_id"] for r in out if r["lang"] == "de"}
        assert de == {50, 51, 52, 53, 54}  # binding stratum fully kept

    def test_missing_weighted_key_empties_output(self, ray_session):
        from marginalia_ray.ops.curation import mixture_sample

        rows = [{"doc_id": i, "lang": "en"} for i in range(10)]
        out = mixture_sample(_ds(rows), {"en": 1, "xx": 1}).take_all()
        assert out == []  # xx has zero rows -> no mixture achievable

    def test_matches_per_key_fmix_order(self, ray_session):
        import numpy as np

        from marginalia_ray.ops.curation import mixture_sample
        from marginalia_ray.ops.text_ops import _FMIX_SPLIT

        rows = [{"doc_id": i, "lang": "en"} for i in range(30)] + [
            {"doc_id": 100 + i, "lang": "de"} for i in range(5)
        ]
        out = mixture_sample(_ds(rows), {"en": 2, "de": 1}).take_all()
        # T = min(30//2, 5//1) = 5 -> en target 10
        en_ids = np.arange(30, dtype=np.uint64)
        h = _FMIX_SPLIT(en_ids)
        expect = set(np.array(sorted(range(30), key=lambda i: (h[i], i)))[:10].tolist())
        assert {r["doc_id"] for r in out if r["lang"] == "en"} == expect


class TestMedianByKey:
    def test_odd_even_and_ties(self, ray_session):
        from marginalia_ray.ops.relational import median_by_key

        rows = (
            [{"k": "a", "v": x} for x in (5, 1, 3)]            # odd -> 3
            + [{"k": "b", "v": x} for x in (1, 2, 3, 10)]       # even -> 2.5
            + [{"k": "c", "v": x} for x in (7, 7, 7, 9)]        # ties -> 7.0
            + [{"k": "d", "v": 4}]                              # singleton -> 4
        )
        out = {r["k"]: r for r in
               median_by_key(_ds(rows), key_col="k", val_col="v").take_all()}
        assert out["a"]["median"] == 3.0 and out["a"]["n"] == 3
        assert out["b"]["median"] == 2.5
        assert out["c"]["median"] == 7.0
        assert out["d"]["median"] == 4.0 and out["d"]["n"] == 1

    def test_empty_pack_input(self, ray_session):
        import pyarrow as pa
        import ray.data

        from marginalia_ray.ops.curation import token_budget_pack

        empty = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
        )
        assert token_budget_pack(empty).take_all() == []


class TestFunnelCount:
    def test_order_strictness_and_partials(self, ray_session):
        from datetime import datetime

        from marginalia_ray.ops.relational import funnel_count

        def ev(u, t, typ):
            return {"user_id": u, "ts": datetime(2024, 1, 1, 0, 0, t), "event_type": typ}

        rows = (
            # u1 completes in order
            [ev(1, 1, "view"), ev(1, 2, "click"), ev(1, 3, "purchase")]
            # u2: purchase BEFORE click -> only 2 steps
            + [ev(2, 1, "view"), ev(2, 2, "purchase"), ev(2, 3, "click")]
            # u3: click at the SAME time as view -> strictness blocks step 2
            + [ev(3, 1, "view"), ev(3, 1, "click")]
            # u4: never views -> 0 steps
            + [ev(4, 1, "click"), ev(4, 2, "purchase")]
            # u5: completes using a later view (greedy from earliest view fails,
            # but the walk is defined greedy-earliest: view@1, click@5, purchase@6)
            + [ev(5, 1, "view"), ev(5, 5, "click"), ev(5, 6, "purchase")]
        )
        out = {r["user_id"]: r for r in
               funnel_count(_ds(rows), steps=["view", "click", "purchase"]).take_all()}
        assert out[1]["steps_completed"] == 3 and out[1]["converted"] == 1
        assert out[2]["steps_completed"] == 2 and out[2]["converted"] == 0
        assert out[3]["steps_completed"] == 1
        assert out[4]["steps_completed"] == 0
        assert out[5]["converted"] == 1


class TestApproxDistinct:
    def test_accuracy_small_and_large(self, ray_session):
        import ray.data

        from marginalia_ray.ops.sketch import approx_distinct_by_key

        rows = (
            # 'big': 20000 distinct values -> raw-estimator path (E > 2.5m)
            [{"k": "big", "v": i} for i in range(20000)]
            # 'small': 40 distinct (each seen 3 times) -> linear counting
            + [{"k": "small", "v": i % 40} for i in range(120)]
        )
        out = {r["k"]: r["approx_distinct"] for r in
               approx_distinct_by_key(ray.data.from_items(rows), key_col="k",
                                      val_col="v").take_all()}
        # m=256 -> standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
        assert abs(out["big"] - 20000) / 20000 < 0.20
        assert abs(out["small"] - 40) / 40 < 0.20

    def test_duplicates_do_not_move_estimate(self, ray_session):
        import ray.data

        from marginalia_ray.ops.sketch import approx_distinct_by_key

        a = [{"k": "x", "v": i} for i in range(500)]
        b = a + [{"k": "x", "v": i} for i in range(500)]  # every value twice
        ea = approx_distinct_by_key(ray.data.from_items(a), key_col="k",
                                    val_col="v").take_all()[0]["approx_distinct"]
        eb = approx_distinct_by_key(ray.data.from_items(b), key_col="k",
                                    val_col="v").take_all()[0]["approx_distinct"]
        assert ea == eb

    def test_msb56_exact(self):
        import numpy as np

        from marginalia_ray.ops.sketch import _msb56

        vals = np.array([1, 2, 3, 255, 256, (1 << 55) + 7, (1 << 56) - 1],
                        dtype=np.uint64)
        expect = np.array([0, 1, 1, 7, 8, 55, 55])
        assert (_msb56(vals) == expect).all()


class TestCountMinSketch:
    def test_overestimate_property_and_exact_hits(self, ray_session):
        import ray.data

        from marginalia_ray.ops.sketch import cms_term_counts

        rows = [{"doc_id": i, "text": "alpha beta " + ("gamma " * (i % 3))}
                for i in range(200)]
        out = cms_term_counts(ray.data.from_items(rows),
                              ["alpha", "beta", "gamma", "missing"]).to_pydict()
        est = dict(zip(out["term"], out["est_count"]))
        exact = {"alpha": 200, "beta": 200,
                 "gamma": sum(i % 3 for i in range(200)), "missing": 0}
        for t, c in exact.items():
            assert est[t] >= c  # CMS never underestimates
        # width=1024 >> 4 distinct terms: no collisions, so estimates exact
        assert est == exact

    def test_depth_cap(self, ray_session):
        import pytest
        import ray.data

        from marginalia_ray.ops.sketch import cms_term_counts

        with pytest.raises(ValueError, match="depth"):
            cms_term_counts(ray.data.from_items([{"doc_id": 1, "text": "x"}]),
                            ["x"], depth=99)


class TestReviewRegressions:
    def test_cms_query_normalization(self, ray_session):
        import ray.data

        from marginalia_ray.ops.sketch import cms_term_counts

        rows = [{"doc_id": i, "text": "The quick fox"} for i in range(10)]
        out = dict(zip(*cms_term_counts(
            ray.data.from_items(rows), ["The", "QUICK", "not a token!", "fox"]
        ).to_pydict().values()))
        assert out["The"] == 10 and out["QUICK"] == 10 and out["fox"] == 10
        assert out["not a token!"] == 0  # can never be emitted by the tokenizer

    def test_knn_zero_query_vector_does_not_vanish(self, ray_session):
        import numpy as np
        import ray.data

        from marginalia_ray.ops.similarity import knn_cosine

        emb = ray.data.from_items(
            [{"vec_id": i, "embedding": [float(i + 1)] * 4} for i in range(6)]
        )
        q = np.zeros((1, 4))
        out = knn_cosine(emb, q, [99], k=3).to_pandas()
        assert len(out) == 3  # zero-norm query degrades, never disappears
        assert np.isfinite(out["score"]).all()

    def test_sessionize_honors_user_col_name(self, ray_session):
        from datetime import datetime

        import ray.data

        from marginalia_ray.ops.relational import sessionize

        rows = [
            {"customer_id": 7, "ts": datetime(2024, 1, 1, 0, 0, i)} for i in range(3)
        ]
        out = sessionize(ray.data.from_items(rows), user_col="customer_id").take_all()
        assert "customer_id" in out[0] and out[0]["customer_id"] == 7

    def test_simhash_chunk_cap_exposed(self, ray_session):
        import ray.data

        from marginalia_ray.ops.dedup import simhash_pairs

        # 12 exact duplicates: identical simhash -> one bucket of 12 docs
        rows = [{"doc_id": i, "text": "same words every time here"} for i in range(12)]
        ds = ray.data.from_items(rows)
        capped = simhash_pairs(ds, max_docs_per_chunk=5).take_all()
        assert capped == []  # bucket over the cap is skipped (documented)
        full = simhash_pairs(ds, max_docs_per_chunk=100).take_all()
        assert len(full) == 12 * 11 // 2  # raising the cap recovers all pairs

    def test_tiny_image_embedding_finite(self):
        import numpy as np

        from marginalia_ray.ops.multimodal import _image_embedding

        for shape in [(1, 1, 3), (2, 2, 3), (3, 5, 3)]:
            v = _image_embedding(np.full(shape, 77, np.uint8), 32)
            assert v.shape == (32,) and np.isfinite(v).all()


class TestExperimentRunner:
    def test_metric_mode(self, ray_session):
        import pyarrow.compute as pc
        import ray.data

        from marginalia_ray.experiment import run_experiment

        ds = ray.data.from_items(
            [{"doc_id": i, "text": "a b c" if i % 2 else "a"} for i in range(20)]
        )

        def fn(batch):
            import pyarrow as pa

            n_chars = pc.sum(pc.utf8_length(batch["text"])).as_py() or 0
            return {"docs": batch.num_rows, "chars": n_chars}

        s = run_experiment(ds, fn)
        assert s["mode"] == "metrics"
        assert s["metrics"]["docs"] == 20
        assert s["metrics"]["chars"] == 10 * 5 + 10 * 1

    def test_row_mode_writes_parquet(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from marginalia_ray.experiment import run_experiment

        ds = ray.data.from_items([{"doc_id": i, "text": "x" * i} for i in range(10)])

        def fn(batch):
            import pyarrow.compute as pc

            return pa.table(
                {"doc_id": batch["doc_id"],
                 "n": pc.cast(pc.utf8_length(batch["text"]), pa.int64())}
            )

        out = tmp_path / "res"
        s = run_experiment(ds, fn, out_path=str(out))
        assert s["mode"] == "rows"
        t = pq.read_table(str(out))
        assert t.num_rows == 10 and set(t.column_names) == {"doc_id", "n"}

    def test_rows_without_sink_raises(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray.data

        from marginalia_ray.experiment import run_experiment

        ds = ray.data.from_items([{"doc_id": 1, "text": "x"}])
        with pytest.raises(ValueError, match="out_path"):
            run_experiment(ds, lambda b: pa.table({"doc_id": b["doc_id"]}))


class TestTokenEntropy:
    def test_known_distributions(self, ray_session):
        import numpy as np

        from marginalia_ray.ops.text_ops import token_entropy

        rows = [
            {"doc_id": 1, "text": "a a a a"},          # H = 0
            {"doc_id": 2, "text": "a b a b"},          # H = ln 2
            {"doc_id": 3, "text": "a b c d"},          # H = ln 4
            {"doc_id": 4, "text": "!!! ??? ..."},      # no tokens
        ]
        out = {r["doc_id"]: r for r in token_entropy(_ds(rows)).take_all()}
        assert out[1]["entropy"] == 0.0 and out[1]["n_distinct"] == 1
        assert out[2]["entropy"] == round(float(np.log(2)), 6)
        assert out[3]["entropy"] == round(float(np.log(4)), 6)
        assert out[4] == {"doc_id": 4, "n_tokens": 0, "n_distinct": 0, "entropy": 0.0}

    def test_counts(self, ray_session):
        from marginalia_ray.ops.text_ops import token_entropy

        rows = [{"doc_id": 9, "text": "The quick brown fox the fox"}]
        (r,) = token_entropy(_ds(rows)).take_all()
        assert r["n_tokens"] == 6 and r["n_distinct"] == 4


def test_mixture_sample_large_string_key_schema(ray_session):
    # ADVICE r3: empty combiner blocks hardcoded string()/int64 and broke
    # schema unification when the key column is large_string
    import ray.data

    from marginalia_ray.ops.curation import mixture_sample

    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "lang": pa.array(
                ["en"] * 20 + ["de"] * 10 + ["zz"] * 10, pa.large_string()
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    out = mixture_sample(ds, {"en": 2, "de": 1}, key_col="lang").take_all()
    # T = min(20//2, 10//1) = 10 -> 20 en + 10 de rows
    langs = sorted(r["lang"] for r in out)
    assert langs == ["de"] * 10 + ["en"] * 20


def test_mixture_sample_no_weighted_keys_empty_typed(ray_session):
    import ray.data

    from marginalia_ray.ops.curation import mixture_sample

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "lang": pa.array(["zz", "yy"], pa.large_string()),
        }
    )
    out = mixture_sample(ray.data.from_arrow(t), {"en": 1}, key_col="lang")
    assert out.count() == 0
    sch = out.schema()
    assert dict(zip(sch.names, [str(t) for t in sch.types]))["lang"] == "large_string"


class TestDsirWeights:
    """DSIR importance resampling (Xie et al. 2023): hashed n-gram bucket
    distributions + per-doc log importance weights."""

    def _mk(self, rows, ray_session):
        import ray.data

        return ray.data.from_items(rows).repartition(4)

    def test_target_like_docs_score_higher(self, ray_session):
        from marginalia_ray.ops.curation import dsir_weights

        english = [
            {"doc_id": i, "text": "the quick brown fox jumps over the lazy dog"}
            for i in range(8)
        ]
        other = [
            {"doc_id": 100 + i, "text": "zxqv wkjy pfmt gzzr bbnn ccxx ddyy eeww"}
            for i in range(8)
        ]
        raw = self._mk(english + other, ray_session)
        target = self._mk(english, ray_session)
        out = dsir_weights(raw, target).to_pandas().set_index("doc_id")
        # docs matching the target distribution get strictly higher logw
        assert out.loc[0, "logw"] > out.loc[100, "logw"]
        assert (out.loc[:7, "logw"].values > out.loc[100:, "logw"].values.max()).all()
        assert (out.n_feats > 0).all()

    def test_deterministic_across_partitionings(self, ray_session):
        """Regression: bucket partials repeating across coalesced iter
        batches must accumulate (np.add.at), not last-write-win."""
        import ray.data

        from marginalia_ray.ops.curation import dsir_weights

        rows = [
            {"doc_id": i, "text": f"common shared words plus token{i % 7} here"}
            for i in range(60)
        ]
        outs = []
        for parts in (1, 6, 13):
            raw = ray.data.from_items(rows).repartition(parts)
            tgt = ray.data.from_items(rows[:20]).repartition(parts)
            df = (
                dsir_weights(raw, tgt)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            outs.append(df)
        assert outs[0].equals(outs[1])
        assert outs[0].equals(outs[2])

    def test_empty_docs_get_zero(self, ray_session):
        from marginalia_ray.ops.curation import dsir_weights

        raw = self._mk(
            [{"doc_id": 1, "text": ""}, {"doc_id": 2, "text": "hello world"}],
            ray_session,
        )
        tgt = self._mk([{"doc_id": 2, "text": "hello world"}], ray_session)
        out = dsir_weights(raw, tgt).to_pandas().set_index("doc_id")
        assert out.loc[1, "n_feats"] == 0
        assert out.loc[1, "logw"] == 0.0


class TestCcnetBuckets:
    def test_thirds_and_keep_cols(self, ray_session):
        from marginalia_ray.ops.curation import ccnet_buckets

        # one source, 9 docs with increasingly repetitive (predictable)
        # text: the most repetitive bigrams get the lowest nll -> head
        rows = [
            {"doc_id": i, "source": "s", "text": " ".join(["a b"] * (10 - i)) + f" w{i} x{i}"}
            for i in range(9)
        ]
        out = {r["doc_id"]: r for r in ccnet_buckets(_ds(rows)).take_all()}
        assert len(out) == 9
        assert all(set(r) == {"doc_id", "source", "n_bigrams", "nll", "bucket"} for r in out.values())
        # nll is monotone in i here (more "a b" mass = more predictable),
        # so the thirds split cleanly 3/3/3 by doc_id
        for i in range(9):
            assert out[i]["source"] == "s"
            assert out[i]["bucket"] == ("head", "middle", "tail")[i // 3]

    def test_per_key_boundaries_independent(self, ray_session):
        from marginalia_ray.ops.curation import ccnet_buckets

        # two sources with disjoint vocab: each must be bucketed against
        # its OWN boundaries -> every source gets at least one head
        # (rarer unique-token bigrams raise nll, so docs differ within a key)
        rows = [
            {
                "doc_id": 10 * k + i,
                "source": f"s{k}",
                "text": " ".join([f"a{k} b{k}"] * (6 - i)) + f" u{k}{i} v{k}{i}",
            }
            for k in range(2)
            for i in range(3)
        ]
        df = ccnet_buckets(_ds(rows)).to_pandas()
        for k in range(2):
            sub = df[df.source == f"s{k}"]
            assert (sub.bucket == "head").any() and (sub.bucket == "tail").any()


def test_funnel_vectorized_walk_matches_per_user_reference(ray_session):
    """Randomized parity: the composite-searchsorted all-users walk must
    equal the obvious per-user greedy loop on every (user, steps) case —
    covers dead users, ts ties, missing step types, empty buckets."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from marginalia_ray.ops.relational import funnel_count

    rng = np.random.RandomState(17)
    steps = ["a", "b", "c"]
    types_pool = ["a", "b", "c", "x"]
    n = 3000
    uid = rng.randint(0, 120, n).astype(np.int64)
    ts = rng.randint(0, 40, n).astype("datetime64[us]")
    tp = [types_pool[i] for i in rng.randint(0, 4, n)]
    eid = np.arange(n, dtype=np.int64)
    t = pa.table({"user_id": pa.array(uid), "ts": pa.array(ts),
                  "event_type": pa.array(tp), "event_id": pa.array(eid)})
    got = {
        r["user_id"]: (r["steps_completed"], r["converted"])
        for r in funnel_count(
            ray.data.from_arrow(t).repartition(7), steps=steps
        ).take_all()
    }

    ts_i = ts.astype(np.int64)
    want = {}
    for u in np.unique(uid):
        m = uid == u
        done = 0
        prev = -np.inf
        for s in steps:
            cand = ts_i[m & (np.asarray(tp, object) == s) & (ts_i > prev)]
            if len(cand) == 0:
                break
            prev = cand.min()
            done += 1
        want[int(u)] = (done, 1 if done == len(steps) else 0)
    assert got == want
