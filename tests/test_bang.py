"""Bang-command parity (BangCommandTest.java:13-19 plus the mid-query
join and !ddg cases the reference implements but doesn't test)."""

from marginalia_ray.query.bang import bang_redirect


class TestBangCommand:
    def test_reference_vectors(self):
        assert bang_redirect("search terms !g") == (
            "https://www.google.com/search?q=search+terms"
        )
        assert bang_redirect("search terms!g") is None
        assert bang_redirect("!gsearch terms") is None
        assert bang_redirect("!g search terms") == (
            "https://www.google.com/search?q=search+terms"
        )

    def test_mid_query_joins_with_one_space(self):
        assert bang_redirect("search !g terms") == (
            "https://www.google.com/search?q=search+terms"
        )

    def test_ddg(self):
        assert bang_redirect("!ddg privacy") == (
            "https://duckduckgo.com/search?q=privacy"
        )

    def test_no_bang(self):
        assert bang_redirect("plain query") is None

    def test_encoding(self):
        assert bang_redirect("a&b !g") == "https://www.google.com/search?q=a%26b"

    def test_tab_is_not_a_space_char(self):
        # Character.isSpaceChar('\t') is false — "term\t!g" must NOT match
        assert bang_redirect("term\t!g") is None
