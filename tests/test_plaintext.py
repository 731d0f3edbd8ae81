"""PlainTextLogic port (M23) pinned on the reference's own test fixtures.

Mirrors ``converting-process/src/test/java/nu/marginalia/converting/logic/
PlainTextLogicTest.java`` (which only prints — the expected strings below
are the traced outputs of the ported semantics on the same inputs, kept as
goldens) plus unit coverage of the underline/sideline quirks the port
preserves from ``PlainTextLogic.java:79-110``.
"""

from marginalia_ray.stages.plaintext import (
    first_n_lines,
    get_description,
    get_title,
    is_sideline,
    is_underline,
)

UML = """\
User Mode Linux HOWTO
User Mode Linux Core Team
Fri Mar  7 11:53:53 EST 2008

This document describes the use and abuse of Jeff Dike's User Mode
Linux: a port of the Linux kernel as a normal Intel Linux process.
______________________________________________________________________

Table of Contents



1. Introduction
   1.1 What is User Mode Linux?
   1.2 How is User Mode Linux Different?
   1.3 How does UML Work?
   1.4 Why Would I Want UML?
"""

CMUCL = """\
========================== C M U C L  20 a =============================

The CMUCL project is pleased to announce the release of CMUCL 20a.
This is a major release which contains numerous enhancements and
bug fixes from the 19f release.

CMUCL is a free, high performance implementation of the Common Lisp
programming language which runs on most major Unix platforms. It
mainly conforms to the ANSI Common Lisp standard.
"""

XPRINT = """\
Archive-name: Xprint/FAQ_OLD
Version: 0.8
Last-Modified: 2003/08/04 15:20:19
Maintained-by: Roland Mainz <Roland.Mainz@informatik.med.uni-giessen.de>

NOTE: This version of the FAQ has been discontinued and was replaced by the
DocBook-based version available under xc/doc/hardcopy/XPRINT/Xprint_FAQ.xml

The following is a list of questions that are frequently asked about
Xprint.
"""

PXE = """\

PXE: Installing Slackware over the network
==========================================


Introduction
------------

    When the time comes to install Slackware on your computer, you have a
limited number of options regarding the location of your Slackware
packages.
"""

SLACKWARE = """\
Announcing Slackware Linux 7.1!

The first major release for 2000, Slackware Linux 7.1 builds on the
success of Slackware 7.0.  In addition to program updates and distribution
enhancements, you'll find the Konfucius (1.90) and the Kleopatra (1.91)
developmental releases of the K Desktop Environment, XFree86 4.0,
OpenMotif 2.1.30, and TrollTech's Qt 2.1.1 library available as system
"""

GARFINKEL = """\
The Net Effect: The DVD Rebellion
By Simson Garfinkel
MIT Technology Review
July/August 2001

Buy a copy of The Matrix on DVD and take it home.  Play it on a Mac or
on a Windows PC and you're in for a pretty good time.
"""


class TestLineSplit:
    def test_lf_cr_crlf_lfcr(self):
        assert first_n_lines("a\nb\nc", 10) == ["a", "b"]
        assert first_n_lines("a\r\nb\r\nc", 10) == ["a", "b"]
        assert first_n_lines("a\n\rb\n\rc", 10) == ["a", "b"]
        # LineUtilsTest.java:11-16 — the reference's exact mixed-
        # terminator vector (LF, CRLF, CR CR, LFCR, LF LF)
        assert first_n_lines("a\nb\r\ncd\r\re\n\rffgg\n\n", 10) == [
            "a", "b", "cd", "", "e", "ffgg", "",
        ]
        assert first_n_lines("a\rb\rc", 10) == ["a", "b"]

    def test_preserves_empties_and_caps(self):
        assert first_n_lines("a\n\n\nb\nc\n", 3) == ["a", "", ""]


class TestRuleDetectors:
    def test_underline(self):
        assert is_underline("__________")
        assert is_underline("  ========== ")  # trailing ws exempt (quirk)
        assert is_underline("=========X")  # final char exempt (quirk)
        assert not is_underline("====")  # too short
        assert not is_underline("---------")  # '-' not a rule char
        assert not is_underline("== == == ==")

    def test_sideline(self):
        assert is_sideline("==== HEADER ====")
        assert is_sideline("** Announcement **")
        assert not is_sideline("==== H ====")  # inner too short
        assert not is_sideline("==========")  # no inner at all
        assert not is_sideline("==== HEADER ----")  # ends differently


class TestTitleGoldens:
    """getTitle over the reference test's own documents."""

    def test_underline_title_uml(self):
        # the ':'-header removal drops the date line; the '_' underline
        # then selects the line above it — the reference's (quirky) pick
        assert (
            get_title("/old/UserModeLinux-HOWTO.txt", first_n_lines(UML, 25))
            == "Linux: a port of the Linux kernel as a normal Intel Linux process."
        )

    def test_sideline_title_cmucl(self):
        assert (
            get_title("/cmucl/news/release-20a.txt", first_n_lines(CMUCL, 25))
            == "C M U C L 20 a"
        )

    def test_lede_title_slackware(self):
        assert (
            get_title("/slackware-7.1/ANNOUNCE.TXT", first_n_lines(SLACKWARE, 25))
            == "Announcing Slackware Linux 7.1!"
        )

    def test_underline_title_pxe(self):
        assert (
            get_title("/usb-and-pxe-installers/README_PXE.TXT", first_n_lines(PXE, 25))
            == "PXE: Installing Slackware over the network"
        )

    def test_filename_fallback_xprint(self):
        # every early line is a short "Key: value" header -> filename
        assert (
            get_title("/docs/XPRINT/Xprint_old_FAQ.txt", first_n_lines(XPRINT, 25))
            == "Xprint_old_FAQ.txt"
        )

    def test_filename_fallback_trailing_slash(self):
        assert get_title("/pub/dir/", ["short", "lines"]) == "/pub/dir/"


class TestDescription:
    def test_prose_lines_joined_and_capped(self):
        d = get_description(first_n_lines(GARFINKEL, 25))
        assert d.startswith("The Net Effect: The DVD Rebellion By Simson Garfinkel")
        assert "July/August 2001" not in d  # fails the 3/4-alphabetic test
        assert len(d) <= 255

    def test_short_lines_dropped(self):
        assert get_description(["hi", "also short", ""]) == ""


class TestConverterDescription:
    """description flows into the converter journal for both branches."""

    def test_text_and_html_descriptions(self, ray_session):
        import pyarrow as pa

        from marginalia_ray.stages.tokenizer import TokenizerStage

        text_body = (
            "Announcing Slackware Linux 7.1!\n\n"
            + "The first major release for 2000 builds on the success of "
            "prior versions with many updates. " * 20
        )
        html_body = (
            "<html><head><title>T</title>"
            '<meta name="description" content="A hand-written description.">'
            "</head><body><p>"
            + "Plain prose content for the body of this page. " * 60
            + "</p></body></html>"
        )
        batch = pa.table(
            {
                "url": [
                    "https://a.example/ANNOUNCE.TXT",
                    "https://b.example/page.html",
                ],
                "text": [text_body, None],
                "html": [None, html_body],
                "lang": ["en", "en"],
            }
        )
        out = TokenizerStage()(batch)
        descs = dict(zip(out["url"].to_pylist(), out["description"].to_pylist()))
        assert descs["https://a.example/ANNOUNCE.TXT"].startswith(
            "Announcing Slackware Linux 7.1!"
        )
        assert len(descs["https://a.example/ANNOUNCE.TXT"]) <= 255
        assert descs["https://b.example/page.html"]  # non-empty summary


class TestSummaryNavStripParity:
    """Round-4 review fix: the converter description routes through the
    canonical SummaryExtractor chain, so the header/nav/ul/li strip
    (SummaryExtractor.java:39) applies before every heuristic."""

    def test_ul_text_never_wins_the_summary(self, ray_session):
        import pyarrow as pa

        from marginalia_ray.stages.tokenizer import TokenizerStage

        prose = "Genuine article prose that should win the summary. " * 12
        listing = "".join(
            f"<li>Sidebar index entry number {i} with plenty of text to "
            f"dominate by raw length</li>"
            for i in range(40)
        )
        html = (
            "<html><head><title>T</title></head><body>"
            f"<nav>Site navigation links here</nav><ul>{listing}</ul>"
            f"<div><p>{prose}</p></div></body></html>"
        )
        batch = pa.table(
            {
                "url": ["https://b.example/article.html"],
                "text": [None],
                "html": [html],
                "lang": ["en"],
            }
        )
        out = TokenizerStage()(batch)
        desc = out["description"].to_pylist()[0]
        assert "Sidebar index entry" not in desc
        assert "Site navigation" not in desc
        assert desc.startswith("Genuine article prose")

    def test_extract_document_eager_path_also_strips(self):
        from marginalia_ray.stages.extract import extract_document

        listing = "".join(
            f"<li>List only content {i} repeated for length padding</li>"
            for i in range(40)
        )
        html = f"<html><body><ul>{listing}</ul></body></html>"
        doc = extract_document(html, base_url="https://x.example/")
        assert "List only content" not in doc.description
