"""M20/M21: HtmlFeatures, AdblockSimulator rule engine, topic detectors.

Fixture semantics mirror FeatureExtractor.java:63-137 and
AdblockSimulator.java:58-180 (the reference ships no adblock unit test;
these fixtures exercise every rule type the parser supports)."""

from marginalia_ray.stages.extract import extract_document, parse_html
from marginalia_ray.stages.features import (
    FEATURE_ADS,
    FEATURE_AFFILIATE,
    FEATURE_FOOD,
    FEATURE_GA_SPAM,
    FEATURE_JS,
    FEATURE_MEDIA,
    FEATURE_TRACKING,
    AdblockRules,
    extract_dom_features,
    ga_spam_p,
    topic_features,
)
from marginalia_ray.stages.sentences import extract_dld


def _root(html: str):
    return parse_html(html)


class TestAdblockRules:
    def test_id_rule(self):
        r = AdblockRules(("header", "###ad"))
        assert r.has_ads(_root('<div id="ad">x</div>'))
        assert not r.has_ads(_root('<div id="main">x</div>'))

    def test_class_rule(self):
        r = AdblockRules(("header", "##.sponsored"))
        assert r.has_ads(_root('<div class="box sponsored">x</div>'))
        assert not r.has_ads(_root('<div class="box">x</div>'))

    def test_script_src_domain_rule(self):
        r = AdblockRules(("header", "||doubleclick.net^$script"))
        assert r.has_ads(_root('<script src="https://doubleclick.net/t.js"></script>'))
        assert not r.has_ads(_root('<script src="https://example.com/app.js"></script>'))

    def test_script_substring_rule(self):
        # no leading slash -> substring matcher; leading slash -> exact
        # equality (AdblockSimulator.toRegexMatcher:96-101)
        r = AdblockRules(("header", "adframe."))
        assert r.has_ads(_root('<script src="/adframe.js"></script>'))
        r2 = AdblockRules(("header", "/adframe."))
        assert not r2.has_ads(_root('<script src="/adframe.js"></script>'))
        assert r2.has_ads(_root('<script src="/adframe."></script>'))

    def test_wildcard_rule(self):
        r = AdblockRules(("header", "banner*.gif"))
        assert r.has_ads(_root('<script src="/img/banner-120x600.gif"></script>'))

    def test_comment_and_exception_rules_ignored(self):
        r = AdblockRules(("header", "! comment", "@@allowlisted", "##p:has(x)"))
        assert not r.id_rules and not r.class_rules and not r.script_rules


class TestDomFeatures:
    def test_js_type_exclusion(self):
        f = extract_dom_features(
            _root('<script type="application/ld+json">{}</script>')
        )
        assert FEATURE_JS not in f
        f = extract_dom_features(_root("<script>var x=1</script>"))
        assert FEATURE_JS in f

    def test_js_via_link_onerror(self):
        f = extract_dom_features(
            _root('<head><link rel="x" onerror="evil()"></head>')
        )
        assert FEATURE_JS in f

    def test_ads_requires_js(self):
        # FeatureExtractor.java:96: ADVERTISEMENT only when JS present
        html_no_js = '<div class="adsbygoogle">x</div>'
        assert FEATURE_ADS not in extract_dom_features(_root(html_no_js))
        html_js = '<script>a()</script><div class="adsbygoogle">x</div>'
        assert FEATURE_ADS in extract_dom_features(_root(html_js))

    def test_tracking_by_src_and_inline(self):
        f = extract_dom_features(
            _root('<script src="https://googletagmanager.com/gtm.js"></script>')
        )
        assert FEATURE_TRACKING in f
        f = extract_dom_features(
            _root("<script>ga('create'); // google-analytics.com</script>")
        )
        assert FEATURE_TRACKING in f

    def test_affiliate(self):
        f = extract_dom_features(_root('<a href="https://amzn.to/3xyz">buy</a>'))
        assert FEATURE_AFFILIATE in f
        f = extract_dom_features(
            _root('<a href="https://www.amazon.com/dp/B0?tag=aff-20">buy</a>')
        )
        assert FEATURE_AFFILIATE in f
        f = extract_dom_features(_root('<a href="https://www.amazon.com/dp/B0">x</a>'))
        assert FEATURE_AFFILIATE not in f

    def test_media(self):
        assert FEATURE_MEDIA in extract_dom_features(_root("<video src=x></video>"))
        assert FEATURE_MEDIA not in extract_dom_features(_root("<p>t</p>"))

    def test_ga_spam(self):
        heads = "".join(f"<h2>What is thing {i}</h2>" for i in range(5))
        assert ga_spam_p(_root(heads)) == 1.0
        assert FEATURE_GA_SPAM in extract_dom_features(_root(heads))
        # 4 positives is not enough (needs > 4)
        heads4 = "".join(f"<h2>Why {i}</h2>" for i in range(4))
        assert ga_spam_p(_root(heads4)) == 0.0


class TestTopicDetectors:
    def test_recipe_detection(self):
        text = (
            "Ingredients for this recipe. Chop the onions and garlic. "
            "Boil water in a pot, add salt and olive oil. Saute the "
            "mushrooms in butter in a skillet, sprinkle flour and bake "
            "the dough in the oven. Garnish with basil and parmesan cheese."
        )
        dld = extract_dld(text, "a recipe")
        assert topic_features(dld) == {FEATURE_FOOD}

    def test_neutral_text_no_category(self):
        dld = extract_dld(
            "The quick brown fox jumps over the lazy dog. " * 10, "title"
        )
        assert topic_features(dld) == set()


class TestPipelineWiring:
    def test_features_reach_extract_document(self):
        html = (
            "<html><head><script src='https://googletagmanager.com/t.js'>"
            "</script></head><body><div class='adsbygoogle'>x</div>"
            "<p>" + "some body text here. " * 30 + "</p></body></html>"
        )
        doc = extract_document(html, base_url="https://example.com/a")
        assert FEATURE_JS in doc.features
        assert FEATURE_TRACKING in doc.features
        assert FEATURE_ADS in doc.features

    def test_synthetic_terms_in_journal(self, ray_session):
        import pyarrow as pa

        from marginalia_ray.functions.hashing import term_hash
        from marginalia_ray.stages.tokenizer import TokenizerStage

        html = (
            "<html><head><script src='https://doubleclick.com/x.js'></script>"
            "</head><body><div class='adsbygoogle'>ad</div><p>"
            + "plenty of text in the body here. " * 30
            + "</p></body></html>"
        )
        batch = pa.table(
            {
                "url": ["https://example.com/page"],
                "html": [html.encode()],
                "lang": ["en"],
            }
        )
        out = TokenizerStage()(batch)
        assert out["state"][0].as_py() == "OK"
        hashes = set(out["term_hashes"][0].as_py())
        assert term_hash("special:scripts") in hashes
        assert term_hash("special:tracking") in hashes
        assert term_hash("special:ads") in hashes
