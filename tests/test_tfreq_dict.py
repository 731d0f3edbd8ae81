"""A5: persisted TermFrequencyDict (tfreq.parquet) feeding the query
frontend's stemmed-compound probe in expand_variants (ADVICE r2: the
surface-form stand-in silently weakened joinTerms recall).

Reference: TermFrequencyDict.java:42-94 (hash parity, load-once dict),
QueryVariants.java:337 (getTermFreqStemmed gating compound joins)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marginalia_ray.functions.hashing import (
    term_freq_hash_stemmed,
    term_freq_hash_string,
)
from marginalia_ray.functions.stemmer import stem


class TestStringHashParity:
    def test_single_word_is_raw_bytes(self):
        assert term_freq_hash_string("keyboard") == term_freq_hash_stemmed("keyboard")

    def test_multi_part_hashes_stems(self):
        # getStringHash splits on " _" and hashes the concatenated stems
        from marginalia_ray.functions.hashing import term_freq_hash_bytes

        expect = term_freq_hash_bytes(
            stem("mechanical").encode(), stem("keyboards").encode()
        )
        assert term_freq_hash_string("mechanical keyboards") == expect
        assert term_freq_hash_string("mechanical_keyboards") == expect


@pytest.fixture(scope="module")
def tf_index(ray_session, tmp_path_factory):
    """Tiny index built with with_term_freq=True over a corpus where the
    compound 'keyboard' is frequent, so stem('key'+'board') is in the dict."""
    from marginalia_ray.pipelines.index_pipeline import run_index_pipeline

    root = tmp_path_factory.mktemp("tfq")
    filler = (
        "the quick brown fox jumps over the lazy dog while typing on the "
        "device every single day because practice makes perfect for all "
        "writers and editors who care about their tools and work habits. "
    )
    rows = []
    for i in range(40):
        rows.append(
            {
                "url": f"http://kb{i % 7}.example.com/p{i}",
                "text": "the mechanical keyboard has keyboard switches. "
                "a keyboard is an input device with keys on a board. "
                + filler * 5,
                "lang": "en",
            }
        )
    pages = root / "pages.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(pages))
    out = root / "idx"
    run_index_pipeline(
        str(pages), str(out), n_shards=4, concurrency=2, with_term_freq=True
    )
    return out


class TestPersistedDict:
    def test_tfreq_parquet_written(self, tf_index):
        t = pq.read_table(str(tf_index / "tfreq.parquet"))
        assert t.num_rows > 0
        assert set(t.column_names) == {"term_key", "doc_freq"}

    def test_engine_loads_and_probes(self, tf_index):
        from marginalia_ray.query.engine import IndexSearcher

        eng = IndexSearcher(tf_index)
        assert eng._tfreq is not None
        k = term_freq_hash_stemmed(stem("keyboard"))
        assert eng.term_freq_dict(k) > 0
        assert eng.term_freq_dict(12345) == 0  # absent key

    def test_compound_join_fires_via_stemmed_dict(self, tf_index):
        """'key board' -> variant containing 'keyboard': joinTerms probes
        the stemmed dict, not the surface-term index (the weakened path)."""
        from marginalia_ray.query.engine import IndexSearcher, Subquery

        eng = IndexSearcher(tf_index)
        subs = eng.expand_variants(Subquery(include=["key", "board"]))
        assert any("keyboard" in sq.include for sq in subs)

    def test_search_query_end_to_end(self, tf_index):
        from marginalia_ray.query.engine import IndexSearcher

        eng = IndexSearcher(tf_index)
        res = eng.search_query("key board")
        assert len(res) > 0  # the joined variant matches the corpus
