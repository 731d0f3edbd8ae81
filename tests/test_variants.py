"""Q2: QueryVariants port — segmentation lattice, re-spellings, compound
joins, English word variants (QueryVariants.java; the reference's own
QueryVariantsTest only prints, so assertions here pin the ported rules)."""

from marginalia_ray.query.variants import QueryVariants


def _qv(known=(), freqs=None, words=()):
    known_set = set(known)
    freqs = freqs or {}
    word_set = set(words)
    return QueryVariants(
        is_known_ngram=lambda s: s in known_set,
        term_freq=lambda w: freqs.get(w, 0.0),
        term_freq_stemmed=lambda s: freqs.get(s, 0.0),
        is_word=lambda w: w in word_set,
    )


class TestFaithful:
    def test_identity_segmentation_present(self):
        vs = _qv().get_query_variants(["mechanical", "keyboard"])
        assert ["mechanical", "keyboard"] in vs.faithful

    def test_ngram_segmentation_present(self):
        vs = _qv().get_query_variants(["mechanical", "keyboard"])
        assert ["mechanical_keyboard"] in vs.faithful

    def test_omittable_words_dropped(self):
        # "the internet is dead" -> "internet dead" in the word-by-word path
        vs = _qv().get_query_variants(["the", "internet", "is", "dead"])
        assert any("the" not in v and "is" not in v and "internet" in v for v in vs.faithful)

    def test_single_omittable_word_kept(self):
        vs = _qv().get_query_variants(["who"])
        assert ["who"] in vs.faithful

    def test_dash_combine_requires_known_ngram(self):
        vs = _qv().get_query_variants(["trs-80"])
        assert ["trs80"] not in vs.faithful
        vs = _qv(known=["trs80"]).get_query_variants(["trs-80"])
        assert ["trs80"] in vs.faithful

    def test_num_split_requires_known_ngram(self):
        vs = _qv().get_query_variants(["trs80"])
        assert ["trs_80"] not in vs.faithful
        vs = _qv(known=["trs_80"]).get_query_variants(["trs80"])
        assert ["trs_80"] in vs.faithful

    def test_rarest_first_ordering(self):
        # higher term freq => lower 1/qp contribution => smaller value first
        freqs = {"common": 10000.0, "rare": 1.0}
        vs = _qv(freqs=freqs).get_query_variants(["common", "rare"])
        # the joined bigram has freq 0 (rarest parts), the split version
        # scores higher; both exist — just assert a deterministic ordering
        assert vs.faithful[0] != vs.faithful[-1] or len(vs.faithful) == 1


class TestAlternatives:
    def test_compound_join_gated_on_freq(self):
        vs = _qv().get_query_variants(["flower", "pot"])
        assert ["flowerpot"] not in vs.alternative
        vs = _qv(freqs={"flowerpot": 50000.0}).get_query_variants(["flower", "pot"])
        assert ["flowerpot"] in vs.alternative

    def test_plural_variant_of_last_word(self):
        vs = _qv(
            freqs={"keyboards": 500.0}, words=["keyboards"]
        ).get_query_variants(["mechanical", "keyboard"])
        assert ["mechanical", "keyboards"] in vs.alternative

    def test_recipe_category_food(self):
        vs = _qv().get_query_variants(["omelet", "recipe"])
        assert any(v[-1] == "category:food" for v in vs.alternative)

    def test_capitalized_last_word_no_variants(self):
        vs = _qv(
            freqs={"keyboards": 500.0}, words=["keyboards"]
        ).get_query_variants(["mechanical", "Keyboard"])
        assert ["mechanical", "keyboards"] not in vs.alternative


class TestEnglishDictionary:
    def test_plural_singular(self):
        qv = _qv(words=["recipe", "recipes", "recipeses"])
        assert qv.find_word_variants("recipes") == ["recipe", "recipeses"]

    def test_sm_st_alternation(self):
        qv = _qv(words=["optimist", "optimists"])
        assert qv.find_word_variants("optimism") == ["optimist", "optimists"]

    def test_short_words_skipped(self):
        assert _qv(words=["as"]).find_word_variants("a") == []


class TestDedup:
    def test_no_duplicate_variants(self):
        vs = _qv().get_query_variants(["salt", "lake", "city"])
        seen = [tuple(v) for v in vs.faithful]
        assert len(seen) == len(set(seen))
