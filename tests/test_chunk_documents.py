"""Unit tests for ops/text_ops.chunk_documents (fixed-size token
chunking with overlap).  DuckDB value parity (overlap=0) lives in
test_oracle.py; these pin the overlap fan-out against a brute-force
reference and the edge cases."""

import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def _brute(tokens, chunk_tokens, overlap):
    step = chunk_tokens - overlap
    L = len(tokens)
    if L == 0:
        return []
    out = []
    c = 0
    while True:
        s = c * step
        if s >= L or (c > 0 and s + 1 > L):
            break
        piece = tokens[s : s + chunk_tokens]
        if not piece:
            break
        out.append((c, " ".join(piece), len(piece)))
        if s + chunk_tokens >= L:
            break
        c += 1
    return out


def _run(rows, **kw):
    from marginalia_ray.ops.text_ops import chunk_documents

    out = chunk_documents(_ds(rows), **kw).take_all()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["n_tokens"])
        )
    return {k: sorted(v) for k, v in got.items()}


class TestChunkDocuments:
    def test_no_overlap_matches_brute_force(self, ray_session):
        toks = [f"w{i}" for i in range(10)]
        rows = [{"doc_id": 1, "text": " ".join(toks)}]
        got = _run(rows, chunk_tokens=4)
        assert got[1] == sorted(_brute(toks, 4, 0))

    def test_overlap_fanout_matches_brute_force(self, ray_session):
        for L in (1, 3, 4, 5, 7, 8, 9, 20):
            toks = [f"t{i}" for i in range(L)]
            rows = [{"doc_id": L, "text": " ".join(toks)}]
            got = _run(rows, chunk_tokens=4, overlap=2)
            assert got[L] == sorted(_brute(toks, 4, 2)), f"L={L}"

    def test_short_doc_single_chunk(self, ray_session):
        rows = [{"doc_id": 1, "text": "only three words"}]
        got = _run(rows, chunk_tokens=128)
        assert got[1] == [(0, "only three words", 3)]

    def test_empty_doc_emits_nothing(self, ray_session):
        rows = [{"doc_id": 1, "text": "..."}, {"doc_id": 2, "text": "ok here"}]
        got = _run(rows, chunk_tokens=4)
        assert 1 not in got and got[2] == [(0, "ok here", 2)]

    def test_invalid_overlap_rejected(self, ray_session):
        from marginalia_ray.ops.text_ops import chunk_documents

        with pytest.raises(ValueError):
            chunk_documents(_ds([]), chunk_tokens=4, overlap=4)
