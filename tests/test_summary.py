"""Summary extraction (M19) heuristic-chain tests (ref SummaryExtractor)."""

from marginalia_ray.stages.summary import extract_summary


def test_meta_description_wins():
    # body text too short for the density heuristics (TagDensityHeuristic
    # requires > 32 chars of qualifying block text), so the chain falls
    # through to the meta tag — the reference's order: domFilter,
    # tagDensity, og, meta, fallback (SummaryExtractor.java:31-36)
    html = """<html><head><meta name="description" content="A fine page about things."></head>
    <body><p>Short body text here.</p></body></html>"""
    assert extract_summary(html) == "A fine page about things."


def test_tag_density_beats_meta_for_article_text():
    # the reference prefers real article text over the meta tag when a
    # low-link high-density block exists (TagDensityHeuristic.java:19-45)
    html = """<html><head><meta name="description" content="A meta description."></head>
    <body><p>Body text that is long and boring but clearly article prose.</p></body></html>"""
    s = extract_summary(html)
    assert "Body text that is long" in s


def test_open_graph_preferred_over_meta():
    html = """<html><head>
    <meta property="og:description" content="OG description here.">
    <meta name="description" content="Plain description.">
    </head><body><p>x</p></body></html>"""
    assert extract_summary(html) == "OG description here."


def test_fallback_body_text():
    html = "<html><body><p>The actual content of the page is here.</p></body></html>"
    assert "actual content" in extract_summary(html)


def test_fallback_drops_link_farms():
    links = "".join(f'<a href="/{i}">linkword{i}</a> ' for i in range(20))
    html = f"""<html><body>
    <p>Real content sentence that is plenty long for the summary to use here.</p>
    <div>{links}</div>
    </body></html>"""
    s = extract_summary(html)
    assert "Real content" in s
    assert "linkword" not in s


def test_nav_stripped_before_heuristics():
    html = """<html><body><nav>Nav junk everywhere</nav>
    <p>Real body text for the summary.</p></body></html>"""
    s = extract_summary(html)
    assert "Nav junk" not in s


def test_truncation_and_junk_chars():
    body = "word " * 100
    html = f"<html><body><p>{body}!!!??? {body}</p></body></html>"
    s = extract_summary(html)
    assert len(s) <= 255
    assert "!!!" not in s
