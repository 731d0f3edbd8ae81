"""Unit tests for ops/dedup.substring_dedup_apply (Lee et al. exact
substring dedup, removal step).  DuckDB value parity lives in
test_oracle.py; these pin the masking semantics and prove the over-cap
dataset-side fallback returns identical results to the broadcast path."""


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _rows():
    return [
        # docs 1 and 2 share the 8-token window (plus unique prefix/suffix)
        {"doc_id": 1, "text": "one two " + SHARED + " tail1 tailx"},
        {"doc_id": 2, "text": "prefix2 " + SHARED + " endtwo"},
        # doc 3: repeats ITS OWN window twice but shares with nobody
        {"doc_id": 3, "text": ("self1 self2 self3 self4 self5 self6 self7 self8 " * 2).strip()},
        # doc 4: shorter than one window
        {"doc_id": 4, "text": "tiny doc here"},
    ]


def _result(**kw):
    from marginalia_ray.ops.dedup import substring_dedup_apply

    out = substring_dedup_apply(_ds(_rows()), window=8, **kw).take_all()
    return {r["doc_id"]: r for r in out}


class TestSubstringDedupApply:
    def test_cross_doc_window_removed_both_sides(self, ray_session):
        got = _result()
        # every token of the shared window is covered in both docs;
        # unique prefix/suffix tokens survive
        assert got[1]["clean_text"] == "one two tail1 tailx"
        assert got[1]["n_removed"] == 8
        assert got[2]["clean_text"] == "prefix2 endtwo"
        assert got[2]["n_removed"] == 8

    def test_within_doc_repeat_is_kept(self, ray_session):
        got = _result()
        assert got[3]["n_removed"] == 0
        assert got[3]["n_kept"] == 16

    def test_short_doc_untouched(self, ray_session):
        got = _result()
        assert got[4]["clean_text"] == "tiny doc here"
        assert got[4]["n_removed"] == 0

    def test_fallback_path_identical(self, ray_session):
        # max_dup_grams=0 forces the dataset-side semi-join + union path
        bcast = _result()
        fb = _result(max_dup_grams=0)
        assert bcast == fb

    def test_overlapping_windows_union_coverage(self, ray_session):
        # two docs share a 9-token run -> two overlapping 8-windows; the
        # union covers all 9 tokens exactly once
        run = SHARED + " iota"  # 9 tokens
        rows = [
            {"doc_id": 1, "text": "u1 " + run + " v1"},
            {"doc_id": 2, "text": "u2 " + run + " v2"},
        ]
        from marginalia_ray.ops.dedup import substring_dedup_apply

        out = {r["doc_id"]: r for r in substring_dedup_apply(_ds(rows), window=8).take_all()}
        assert out[1]["clean_text"] == "u1 v1"
        assert out[1]["n_removed"] == 9
        assert out[2]["n_removed"] == 9
