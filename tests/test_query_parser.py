"""Query-parser tests mirroring the reference's QueryParserTest cases
(ref code/features-search/query-parser/src/test/.../QueryParserTest.java)."""

from marginalia_ray.query.engine import SpecLimit
from marginalia_ray.query.parser import parse_query, parse_tokens


def test_plain_terms():
    spec = parse_query("hello world")
    sq = spec.subqueries[0]
    assert sq.include == ["hello", "world"]
    assert sq.exclude == [] and sq.priority == []


def test_negation_and_priority():
    sq = parse_query("linux -windows ?bsd").subqueries[0]
    assert sq.include == ["linux"]
    assert sq.exclude == ["windows"]
    assert sq.priority == ["bsd"]


def test_quoted_ngram_coherence():
    sq = parse_query('"free software"').subqueries[0]
    assert "free_software" in sq.advice
    assert ["free", "software"] in sq.coherences
    assert sq.include == ["free", "software"]


def test_quoted_with_stopword_falls_back():
    # "of" is a stop word -> whole joined term becomes a plain include
    sq = parse_query('"best of breed"').subqueries[0]
    assert sq.include == ["best_of_breed"]
    assert sq.coherences == []


def test_quality_year_size_rank_limits():
    spec = parse_query("term q>5 year=1998 size<100 rank>2")
    assert spec.quality == SpecLimit.ge(5)
    assert spec.year == SpecLimit.eq(1998)
    assert spec.size == SpecLimit.le(100)
    assert spec.rank == SpecLimit.ge(2)
    assert spec.subqueries[0].include == ["term"]


def test_advice_colon_terms():
    sq = parse_query("kernel site:kernel.org").subqueries[0]
    assert sq.include == ["kernel"]
    assert sq.advice == ["site:kernel.org"]


def test_paren_advice():
    sq = parse_query("linux (debian)").subqueries[0]
    assert sq.include == ["linux"]
    assert sq.advice == ["debian"]


def test_advice_only_becomes_include():
    sq = parse_query("site:example.com").subqueries[0]
    assert sq.include == ["site:example.com"]
    assert sq.advice == []


def test_trailing_colon_trim():
    toks = parse_tokens("search: stuff")
    assert toks[0].s == "search"
    assert toks[0].type == "LITERAL_TERM"


def test_unterminated_quote():
    sq = parse_query('"free software').subqueries[0]
    assert sq.include == ["free", "software"] or sq.include == ["free_software"]


def test_variant_expansion_uses_index_ngrams(ray_session, tmp_path):
    """Q2: 'a b' expands to the a_b n-gram variant when the index has it."""
    from marginalia_ray.pipelines.index_pipeline import run_index_pipeline
    from marginalia_ray.query.engine import IndexSearcher
    from marginalia_ray.sources.pages import pages_parquet

    pages = pages_parquet(200, cache_dir=str(tmp_path / "p"))
    run_index_pipeline(pages, str(tmp_path / "i"), n_shards=4, concurrency=2)
    s = IndexSearcher(tmp_path / "i")

    # find an n-gram term actually present in the index
    from marginalia_ray.functions.hashing import term_hash
    from marginalia_ray.query.engine import Subquery

    # proper-name spans in the synthetic corpus produce joined terms; probe a
    # few capitalized title bigrams until one resolves
    import itertools

    from marginalia_ray.sources.pages import make_page

    found = None
    for i in range(50):
        p = make_page(i, 200)
        title_words = [w.lower() for w in p["text"].split(".")[0].split()][:6]
        for a, b in itertools.pairwise(title_words):
            ng = f"{a}_{b}"
            th = term_hash(ng)
            if th is not None and s.num_hits(th) > 0:
                found = (a, b, ng)
                break
        if found:
            break
    assert found, "no ngram term present in the test index"
    a, b, ng = found
    variants = s.expand_variants(Subquery(include=[a, b]))
    # the span lattice produces both the word-by-word segmentation and the
    # joined n-gram; trimArray caps at 5 (QueryFactory.java:106-110)
    assert 2 <= len(variants) <= s.MAX_VARIANTS
    includes = [v.include for v in variants]
    assert [ng] in includes
    assert [a, b] in includes

    # unknown words still segment (faithful variants are index-blind, like
    # the reference's), but produce no dash/num/compound alternatives
    v2 = s.expand_variants(Subquery(include=["zzzz", "qqqq"]))
    assert 1 <= len(v2) <= s.MAX_VARIANTS
    assert ["zzzz", "qqqq"] in [v.include for v in v2]
