"""HTML fetch + article extraction for the web connectors.

Behavior parity with the reference (/root/reference/crates/perceive-core/
sources/parse_html.rs): conditional GET with If-Modified-Since +
If-None-Match/ETag, HTTP-status -> SkipReason mapping, non-text content
stored with empty content (keeps title/etag so we never re-fetch), raw HTML
zstd-compressed for reprocessing, readability-style article extraction.

The extractor is in-house (no readability-lxml in the image): strip
script/style/nav chrome, score candidate containers by text mass and link
density, return (title, text) — same contract as the reference's
readability::extractor (parse_html.rs:32-39).
"""

from __future__ import annotations

import email.utils
import re
import sys
from typing import Optional
from urllib.parse import urlsplit

from ..types import Item, SkipReason
from .fs import compress_raw, decompress_raw
from .scanner import FoundItem, ReadResult

ALWAYS_SKIP = (
    # Sign-in/console pages: frequent in history, never searchable content
    # (reference parse_html.rs:11-18)
    "accounts.google.com",
    "ad.doubleclick.net",
    "console.cloud.google.com",
    "console.aws.amazon.com",
    "googleapis.com",
)

HTML_PROCESS_VERSION = 1
USER_AGENT = "perceive-tpu-search"
FETCH_TIMEOUT = 30


def should_skip(skip: list[str], url: str) -> bool:
    """Suffix-match the host against skip + ALWAYS_SKIP
    (reference parse_html.rs:22-28)."""
    host = urlsplit(url).hostname or ""
    return any(host.endswith(s) for s in (*skip, *ALWAYS_SKIP))


# -- article extraction ------------------------------------------------------

_STRIP_TAGS = {
    "script", "style", "noscript", "template", "svg", "iframe", "form",
    "nav", "header", "footer", "aside", "button",
}
_NEGATIVE_RE = re.compile(
    r"comment|sidebar|footer|header|menu|nav|promo|related|share|social|sponsor|ad-|advert",
    re.I,
)
_BLOCK_TAGS = {"p", "pre", "li", "blockquote", "h1", "h2", "h3", "h4", "td", "article", "section", "div"}


def extract_html_article(url: str, raw: bytes) -> tuple[str, str]:
    """(title, text) from raw HTML — readability-lite.

    Candidate containers are scored by text length discounted by link
    density; the winner's block-level text is joined with newlines.  Falls
    back to whole-body text when no candidate scores.
    """
    import lxml.html

    try:
        doc = lxml.html.fromstring(raw)
    except Exception:
        return "", ""

    title = ""
    t = doc.find(".//title")
    if t is not None and t.text:
        title = t.text.strip()
    og = doc.find('.//meta[@property="og:title"]')
    if og is not None and og.get("content"):
        title = og.get("content").strip() or title
    h1 = doc.find(".//h1")
    if not title and h1 is not None:
        title = (h1.text_content() or "").strip()

    # materialize before mutating: drop_tree() mid-iteration dead-ends
    # lxml's walk inside the detached subtree and leaves later chrome intact
    for el in list(doc.iter()):
        if el.tag in _STRIP_TAGS and el.getparent() is not None:
            el.drop_tree()

    def link_len(el) -> int:
        return sum(len((a.text_content() or "")) for a in el.findall(".//a"))

    best, best_score = None, 0.0
    for el in doc.iter():
        if el.tag not in ("div", "article", "section", "main", "td", "body"):
            continue
        idcls = f"{el.get('id', '')} {el.get('class', '')}"
        text = el.text_content() or ""
        tl = len(text.strip())
        if tl < 80:
            continue
        density = link_len(el) / tl if tl else 1.0
        score = tl * (1.0 - density)
        if _NEGATIVE_RE.search(idcls):
            score *= 0.25
        if el.tag in ("article", "main"):
            score *= 1.5
        if score > best_score:
            best, best_score = el, score

    root = best if best is not None else doc
    parts: list[str] = []
    seen_text = set()
    leaf_tags = tuple(t for t in _BLOCK_TAGS if t not in ("article", "section", "div"))
    for el in root.iter():
        if el.tag in _BLOCK_TAGS and el.tag != "div":
            # only leaf blocks contribute text: a container (article/li/td
            # holding <p>s) would duplicate every child paragraph
            if next(el.iterdescendants(*leaf_tags), None) is not None:
                continue
            txt = re.sub(r"\s+", " ", el.text_content() or "").strip()
            if txt and txt not in seen_text:
                seen_text.add(txt)
                parts.append(txt)
    if not parts:
        txt = re.sub(r"\s+", " ", root.text_content() or "").strip()
        parts = [txt] if txt else []
    return title, "\n".join(parts)


def reprocess_html_article(item: Item) -> ReadResult:
    """Re-extract from stored raw HTML; Found only when the result changed
    (reference parse_html.rs:41-72)."""
    if item.raw_content is None:
        return ReadResult.UNCHANGED
    raw = decompress_raw(item.raw_content)
    title, text = extract_html_article(item.external_id, raw)
    changed = (item.metadata.name != title) or (item.content != text)
    if not changed:
        return ReadResult.UNCHANGED
    item.process_version = HTML_PROCESS_VERSION
    item.metadata.name = title
    item.content = text
    return ReadResult.FOUND


# -- fetch -------------------------------------------------------------------


def fetch_html(session, existing: Optional[FoundItem], item: Item) -> ReadResult:
    """Conditional GET + extract (reference parse_html.rs:74-182).

    ``session`` is requests.Session-shaped: ``get(url, headers=, timeout=,
    allow_redirects=False)`` -> response with .status_code/.headers/.text.
    """
    headers = {"User-Agent": USER_AGENT}
    mtime = item.metadata.mtime
    if mtime is None and existing is not None:
        mtime = existing.modified  # stored Last-Modified from the prior fetch
    if mtime is not None:
        headers["If-Modified-Since"] = email.utils.formatdate(mtime, usegmt=True)
    etag = item.hash or (existing.hash if existing else None)
    if etag:
        headers["If-None-Match"] = etag

    try:
        resp = session.get(
            item.external_id, headers=headers, timeout=FETCH_TIMEOUT, allow_redirects=False
        )
    except Exception as e:  # noqa: BLE001 — degrade to skip, never abort scan
        print(f"{item.external_id}: fetch error {e}", file=sys.stderr)
        item.skipped = SkipReason.FETCH_ERROR
        return ReadResult.FOUND

    status = resp.status_code
    if status == 304:
        return ReadResult.UNCHANGED

    if status in (401, 403):
        item.skipped = SkipReason.UNAUTHORIZED
    elif status == 404:
        item.skipped = SkipReason.NOT_FOUND
    elif 300 <= status < 400:
        item.skipped = SkipReason.REDIRECTED
    elif status >= 400:
        item.skipped = SkipReason.FETCH_ERROR
    if item.skipped is not None:
        return ReadResult.FOUND

    content_type = (resp.headers.get("Content-Type") or "text/plain").split(";")[0].strip()
    item.hash = resp.headers.get("ETag")
    lm = resp.headers.get("Last-Modified")
    if lm:
        try:
            item.metadata.mtime = int(email.utils.parsedate_to_datetime(lm).timestamp())
        except (TypeError, ValueError):
            pass

    if not content_type.startswith("text/"):
        # keep the row (title/etag/mtime) with empty content so PDFs etc.
        # don't re-fetch every scan (parse_html.rs:148-154)
        item.content = ""
        return ReadResult.FOUND

    raw_text = resp.text or ""
    if not raw_text:
        item.skipped = SkipReason.NO_CONTENT
        return ReadResult.FOUND

    if content_type.startswith("text/html"):
        item.raw_content = compress_raw(raw_text.encode("utf-8"))
        title, text = extract_html_article(item.external_id, raw_text.encode("utf-8"))
        item.metadata.name = title or item.metadata.name
        item.content = text
    else:
        item.content = raw_text
    item.process_version = HTML_PROCESS_VERSION
    return ReadResult.FOUND


def make_session():
    """Default HTTP client: gzip, no redirects (handled as SkipReason),
    30 s timeout (reference chromium_history.rs:41-46)."""
    import requests

    return requests.Session()
