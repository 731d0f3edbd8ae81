"""M9: LanguageFilter — unicode-block rejection + dictionary agreement.

Mirrors LanguageFilterTest.java plus the converter wiring: a page in a
blocked script is disqualified LANGUAGE when no input lang column exists."""

import pyarrow as pa

from marginalia_ray.stages.extract import parse_html
from marginalia_ray.stages.langfilter import (
    dictionary_agreement,
    is_blocked_unicode,
    page_interesting_by_html_tag,
    page_interesting_by_meta,
)
from marginalia_ray.stages.sentences import extract_dld
from marginalia_ray.stages.tokenizer import TokenizerStage


class TestBlockedUnicode:
    def test_english_not_blocked(self):
        assert not is_blocked_unicode("The quick brown fox. " * 200)

    def test_cjk_blocked_at_17_chars(self):
        # sensitive range (CJK Unified): blocked at >= 17 matching chars
        assert is_blocked_unicode("中" * 17 + "x" * 100)
        assert not is_blocked_unicode("中" * 10 + "x" * 100)

    def test_cyrillic_blocked_at_102_chars(self):
        assert is_blocked_unicode("а" * 102)
        assert not is_blocked_unicode("а" * 50)

    def test_only_first_2000_chars_count(self):
        assert not is_blocked_unicode("x" * 2000 + "中" * 100)


class TestDictionaryAgreement:
    def test_english_text_high(self):
        dld = extract_dld(
            "The people of the world want good work and a better life. "
            "Every day they find new ways to make things happen. " * 3,
            "title",
        )
        assert dictionary_agreement(dld) >= 0.1

    def test_gibberish_low(self):
        dld = extract_dld(
            "Qworplex zintrab vomblurg xaqqish drenploth kvarnyx "
            "blorptang wezzlfrum gnarpixel thwombat. " * 5,
            "t",
        )
        assert dictionary_agreement(dld) < 0.1


class TestHtmlTagHelpers:
    def test_html_lang(self):
        # LanguageFilterTest.java:14-16
        assert page_interesting_by_html_tag(parse_html("<html></html>")) is None
        assert page_interesting_by_html_tag(parse_html('<html lang="en"></html>')) is True
        assert page_interesting_by_html_tag(parse_html('<html lang="no"></html>')) is False

    def test_meta_language(self):
        root = parse_html('<meta http-equiv="Content-Language" content="en-US">')
        assert page_interesting_by_meta(root) is True
        root = parse_html('<meta http-equiv="Content-Language" content="de">')
        assert page_interesting_by_meta(root) is False
        assert page_interesting_by_meta(parse_html("<p>x</p>")) is None


class TestConverterWiring:
    def _batch(self, html: str, with_lang: bool):
        cols = {"url": ["https://example.com/p"], "html": [html.encode()]}
        if with_lang:
            cols["lang"] = ["en"]
        return pa.table(cols)

    def test_blocked_script_disqualified_without_lang_column(self, ray_session):
        html = "<html><body><p>" + "中文内容 " * 200 + "</p></body></html>"
        out = TokenizerStage()(self._batch(html, with_lang=False))
        assert out["state"][0].as_py() == "LANGUAGE"

    def test_gibberish_disqualified_without_lang_column(self, ray_session):
        body = "Qworplex zintrab vomblurg xaqqish drenploth kvarnyx. " * 40
        html = f"<html><body><p>{body}</p></body></html>"
        out = TokenizerStage()(self._batch(html, with_lang=False))
        assert out["state"][0].as_py() == "LANGUAGE"

    def test_english_ok_without_lang_column(self, ray_session):
        body = (
            "The people of the world want good work and a better life "
            "every day in many ways and places. " * 20
        )
        html = f"<html><body><p>{body}</p></body></html>"
        out = TokenizerStage()(self._batch(html, with_lang=False))
        assert out["state"][0].as_py() == "OK"

    def test_lang_column_trusted(self, ray_session):
        # gibberish but lang column says en -> no agreement check
        body = "Qworplex zintrab vomblurg xaqqish drenploth kvarnyx. " * 40
        html = f"<html><body><p>{body}</p></body></html>"
        out = TokenizerStage()(self._batch(html, with_lang=True))
        assert out["state"][0].as_py() == "OK"
