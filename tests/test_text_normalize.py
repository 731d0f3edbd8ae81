"""Unit tests for ops/text_ops.text_normalize (NFC + whitespace
collapse).  Pinned here: the pyarrow utf8_normalize divergence that
forced the unicodedata path, the ASCII fast path, and the changed flag."""

import unicodedata

import pyarrow as pa


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


class TestTextNormalize:
    def test_nfc_recomposition_and_flags(self, ray_session):
        from marginalia_ray.ops.text_ops import text_normalize

        decomposed = "café time"  # e + combining acute
        composed = "café time"
        rows = [
            {"doc_id": 1, "text": decomposed},
            {"doc_id": 2, "text": composed},
            {"doc_id": 3, "text": "plain  double  spaces "},
            {"doc_id": 4, "text": "already clean"},
        ]
        out = {r["doc_id"]: r for r in text_normalize(_ds(rows)).take_all()}
        assert out[1]["norm_text"] == composed and out[1]["changed"]
        assert out[2]["norm_text"] == composed and not out[2]["changed"]
        assert out[3]["norm_text"] == "plain double spaces" and out[3]["changed"]
        assert out[4]["norm_text"] == "already clean" and not out[4]["changed"]

    def test_matches_python_nfc_on_mixed_scripts(self, ray_session):
        from marginalia_ray.ops.text_ops import text_normalize

        samples = ["Å ngström", "gärden", "ﬁsh ligature", "ascii only"]
        rows = [{"doc_id": i, "text": s} for i, s in enumerate(samples)]
        out = {r["doc_id"]: r["norm_text"] for r in text_normalize(_ds(rows)).take_all()}
        for i, s in enumerate(samples):
            assert out[i] == unicodedata.normalize("NFC", s).strip()

    def test_pyarrow_nfc_kernel_still_divergent(self):
        # the reason text_normalize avoids pc.utf8_normalize: if this
        # starts FAILING, pyarrow fixed composition and the op can switch
        # back to the vectorized kernel
        import pyarrow.compute as pc

        got = pc.utf8_normalize(pa.array(["é"]), form="NFC").to_pylist()[0]
        assert got != "é", "pyarrow NFC now composes — simplify text_normalize"
