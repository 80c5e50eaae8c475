"""Golden tests for the arc90 article extractor (VERDICT r1 #6) on saved
realistic pages: a news article with nav/comments/related chrome, a docs
page with sidebar/TOC, a JS-shell app, and a blog post with figure and
newsletter chrome."""

from pathlib import Path

import pytest

from perceive_tpu.sources.readability import extract_article

PAGES = Path(__file__).resolve().parent / "fixtures" / "pages"


def _extract(name):
    return extract_article((PAGES / name).read_bytes())


def test_news_article():
    title, text = _extract("news.html")
    assert title == "City Council Approves New Transit Plan"
    # the five article paragraphs survive
    for frag in (
        "voted 7-2 on Tuesday",
        "extend the Blue Line eleven miles",
        "a car is an option rather than a requirement",
        "$18 million annually",
        "utility relocation along the eastern corridor",
    ):
        assert frag in text, f"article text lost: {frag!r}"
    # chrome is gone
    for chrome in (
        "Subscribe now",            # nav
        "We use cookies",           # cookie banner
        "Transit authority names",  # related-articles rail
        "waste of taxpayer money",  # comments
        "All rights reserved",      # footer
    ):
        assert chrome not in text, f"chrome leaked: {chrome!r}"


def test_docs_page():
    title, text = _extract("docs.html")
    assert "Configuring retry policies" in title
    for frag in (
        "retry failed operations automatically",
        "exponential backoff with jitter",
        "max_attempts=5",
        "idempotency token",
        "never retried",
        "DeadlineExceeded",
    ):
        assert frag in text, f"docs content lost: {frag!r}"
    assert "Quickstart" not in text  # sidebar
    assert "On this page" not in text  # TOC


def test_js_shell_app():
    title, text = _extract("jsapp.html")
    assert title == "Flight Tracker Pro"
    # nothing useful to extract — must not crash and must not leak the bundle
    assert "__APP_STATE__" not in text
    assert "function" not in text


def test_blog_post():
    title, text = _extract("blog.html")
    assert "sourdough failed at altitude" in title
    for frag in (
        "flat, gummy, and sour",
        "fermentation gases expand faster",
        "ninety-two degrees Celsius",
        "start with less leaven",
    ):
        assert frag in text, f"blog content lost: {frag!r}"
    assert "Subscribe to get new posts" not in text  # newsletter aside
    assert "Share on social" not in text
    assert "Unsubscribe anytime" not in text  # footer
    # figcaption is genuine content
    assert "the pancake era" in text


def test_garbage_and_fragments():
    assert extract_article(b"") == ("", "")
    extract_article(b"\x00\xff\xfe binary")  # must not crash (lxml is lenient)
    t, x = extract_article(b"<p>Just one paragraph, nothing else, but long enough to matter here.</p>")
    assert "Just one paragraph" in x


def _page(body: str, title: str = "T") -> bytes:
    return f"<html><head><title>{title}</title></head><body>{body}</body></html>".encode()


def test_media_class_content_not_hard_dropped():
    """Bootstrap's ubiquitous media-object markup (class='media') is CONTENT
    wrapping, not chrome: the hard-drop list must stay narrower than the
    -25-scoring list (review r3, reproduced — whole sections vanished)."""
    para = "The committee heard testimony from twelve residents, who described the flooding in detail."
    body = (
        "<div class='content'>"
        "<p>Opening paragraph with enough text to score well, including commas, clauses, and length.</p>"
        f"<div class='media'><p>{para}</p></div>"
        "<p>Closing paragraph that also carries a reasonable amount of article text for scoring.</p>"
        "</div>"
    )
    _, text = extract_article(_page(body))
    assert para in text, "content inside a class='media' div was dropped"


def test_repeated_content_not_deduplicated():
    """Genuinely repeated text (interview answers, chorus lines) must ALL
    survive extraction (review r3, reproduced: a global seen-set kept only
    the first occurrence)."""
    body = (
        "<div class='content'>"
        "<p>Did you expect the result to replicate across all seven trials?</p>"
        "<p>Yes.</p>"
        "<p>And did the second cohort show the same effect size as the first?</p>"
        "<p>Yes.</p>"
        "</div>"
    )
    _, text = extract_article(_page(body))
    assert text.count("Yes.") == 2, f"repeated answers deduplicated: {text!r}"


def test_title_dash_clause_preserved_site_name_stripped():
    """The trailing-site-name strip must not truncate legitimate dash
    clauses (review r3, reproduced)."""
    _, _ = extract_article(_page("<p>x</p>"))  # smoke
    from perceive_tpu.sources.readability import extract_title
    import lxml.html

    doc = lxml.html.fromstring(_page("<p>x</p>", "Understanding attention - and beyond"))
    assert extract_title(doc) == "Understanding attention - and beyond"
    doc2 = lxml.html.fromstring(_page("<p>x</p>", "City approves transit plan - The Tribune"))
    assert extract_title(doc2) == "City approves transit plan"
