"""Pubdate heuristic chain tests (M18, ref PubDateSnifferTest.java style)."""

from marginalia_ray.stages.pubdate import sniff_pub_year


def test_opengraph_meta():
    html = '<meta property="article:published_time" content="2019-03-01T00:00:00Z">'
    assert sniff_pub_year(html, "https://x.example/") == 2019


def test_meta_reversed_attr_order():
    html = '<meta content="2017-06-02" name="datePublished">'
    assert sniff_pub_year(html, "https://x.example/") == 2017


def test_json_ld():
    html = '<script type="application/ld+json">{"@type":"Article","datePublished":"2015-08-20"}</script>'
    assert sniff_pub_year(html, "https://x.example/") == 2015


def test_json_ld_list_and_invalid_json():
    html = (
        '<script type="application/ld+json">not json</script>'
        '<script type="application/ld+json">[{"datePublished":"2012-01-01"}]</script>'
    )
    assert sniff_pub_year(html, "https://x.example/") == 2012


def test_microdata_itemprop():
    html = '<span itemprop="datePublished" content="2009-11-04">Nov 4</span>'
    assert sniff_pub_year(html, "https://x.example/") == 2009


def test_html5_time_tag():
    html = "<time datetime='2021-02-03'>Feb 3</time>"
    assert sniff_pub_year(html, "https://x.example/") == 2021


def test_url_pattern():
    assert sniff_pub_year("<html></html>", "https://x.example/2004/05/post") == 2004


def test_standard_era_fallback():
    assert sniff_pub_year("<html></html>", "https://x.example/p", "HTML5") == 2018
    assert sniff_pub_year("<html></html>", "https://x.example/p", "HTML123") == 1997


def test_priority_order_meta_beats_url():
    html = '<meta property="article:published_time" content="2019-01-01">'
    assert sniff_pub_year(html, "https://x.example/2004/post") == 2019


def test_implausible_years_rejected():
    html = '<meta property="article:published_time" content="1850-01-01">'
    # 1850 out of range -> falls through to url/standard (none here)
    assert sniff_pub_year(html, "https://x.example/p") is None


class TestLastModified:
    """PubDateHeuristicLastModified.java:17-27 — the 13th heuristic, fed
    by an optional `headers` column on the input pages table."""

    def test_header_parsed(self):
        from marginalia_ray.stages.pubdate import h_last_modified

        hdrs = "Content-Type: text/html\nLast-Modified: Tue, 04 May 2010 09:00:00 GMT\n"
        assert h_last_modified(hdrs) == 2010

    def test_case_insensitive_key(self):
        from marginalia_ray.stages.pubdate import h_last_modified

        assert h_last_modified("last-modified: Wed, 21 Oct 2015 07:28:00 GMT") == 2015

    def test_absent_header(self):
        from marginalia_ray.stages.pubdate import h_last_modified

        assert h_last_modified("Content-Type: text/html\n") is None
        assert h_last_modified("") is None

    def test_chain_position_before_standard_guess(self):
        # no in-document signal; the header decides before the standard guess
        from marginalia_ray.stages.pubdate import sniff_pub_year

        html = "<!DOCTYPE html><html><body><p>no dates here at all</p></body></html>"
        y = sniff_pub_year(
            html, "https://a.example/page", "HTML5",
            headers="Last-Modified: Thu, 02 Mar 2006 11:00:00 GMT\n",
        )
        assert y == 2006

    def test_tokenizer_accepts_headers_column(self):
        import pyarrow as pa

        from marginalia_ray.model.codecs import doc_meta_year
        from marginalia_ray.stages.tokenizer import TokenizerStage

        html = "<!DOCTYPE html><body><p>" + "plain words here. " * 60 + "</p></body>"
        t = pa.table(
            {
                "url": ["https://a.example/x"],
                "html": pa.array([html.encode()], pa.binary()),
                "lang": ["en"],
                "headers": ["Last-Modified: Fri, 05 Jan 2018 00:00:00 GMT\n"],
            }
        )
        out = TokenizerStage()(t)
        assert out["state"][0].as_py() == "OK"
        meta = out["doc_meta"][0].as_py()
        assert doc_meta_year(meta) == 2018
