"""HTML-turn extraction: stack-based tokenizer + boilerplate block scoring.

Plays the role of the reference's overlay cleanup + block detection for image
pages (``marie/overlay/overlay.py:291-373`` removes non-content overlay;
``marie/boxes/dit/ulim_dit_box_processor.py:507-833`` finds text blocks) for
HTML fragments embedded in transcript turns: segment the markup into text
blocks, score each block by link density and structural context
(Boilerpipe/Trafilatura-style), keep main-content blocks in document order.

Deterministic, model-free, fail-open: any malformed markup degrades to text
(unclosed tags close implicitly; stray ``<`` is literal text).
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Iterator

from .textnorm import join_lines

# Elements whose entire subtree is boilerplate.
BOILERPLATE_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "form", "button", "select", "option",
     "iframe", "svg", "figure", "figcaption"}
)
# Raw-text elements: content is skipped wholesale.
RAW_TEXT_TAGS = frozenset({"script", "style", "noscript", "template", "textarea"})
# Content inside <head> is never page content.
HEAD_TAGS = frozenset({"head", "title", "meta", "link", "base"})
# Block-level boundaries: entering/leaving one flushes the current text block.
BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "li", "ul", "ol", "table", "tr",
     "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
     "body", "html", "br", "hr", "dl", "dt", "dd"}
)
# Void elements never go on the open-tag stack.
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "base", "area", "col",
     "embed", "source", "track", "wbr"}
)
# class/id keywords that mark a subtree as boilerplate (cookie banners,
# menus, ads — the keyword heuristic used by mainstream content extractors).
BOILERPLATE_KEYWORDS = (
    "cookie", "banner", "consent", "nav", "menu", "footer", "header",
    "sidebar", "advert", "promo", "breadcrumb", "share", "social",
)
_BOILER_KEYWORD_RE = re.compile("|".join(BOILERPLATE_KEYWORDS))
# A block is boilerplate when more than this fraction of its words sit
# inside anchors (Boilerpipe's link-density rule).
MAX_LINK_DENSITY = 0.5

_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)
_TAG_OPEN_RE = re.compile(r"<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9-]*)")
# shared empty attr dict for text/close events (hot path: one dict alloc per
# token adds up at 10^12 turns; consumers never mutate it)
_NO_ATTRS: dict[str, str] = {}
_RAW_CLOSE_RES: dict[str, re.Pattern] = {}


def looks_like_html(text: str) -> bool:
    """Cheap payload sniff: does this contain a real-looking tag?"""
    return re.search(r"<\s*/?\s*[a-zA-Z][a-zA-Z0-9-]*(\s|>|/)", text) is not None


def _tokenize(src: str) -> Iterator[tuple[str, str, dict[str, str]]]:
    """Yield ('text', chunk, {}) | ('open'|'close'|'selfclose', tag, attrs).

    Hand-rolled scanner: comments, doctypes and processing instructions are
    dropped; raw-text elements swallow everything up to their close tag; a
    '<' that doesn't start a plausible tag is literal text.
    """
    i, n = 0, len(src)
    while i < n:
        lt = src.find("<", i)
        if lt == -1:
            yield ("text", src[i:], _NO_ATTRS)
            break
        if lt > i:
            yield ("text", src[i:lt], _NO_ATTRS)
        nxt = src[lt + 1] if lt + 1 < n else ""
        if nxt in "!?":  # comments / doctype / processing instructions
            if src.startswith("<!--", lt):
                end = src.find("-->", lt + 4)
                i = n if end == -1 else end + 3
                continue
            end = src.find(">", lt)
            i = n if end == -1 else end + 1
            continue
        m = _TAG_OPEN_RE.match(src, lt)
        if not m:
            yield ("text", "<", _NO_ATTRS)
            i = lt + 1
            continue
        closing = m.group(1) == "/"
        tag = m.group(2).lower()
        end = src.find(">", lt)
        if end == -1:
            break  # truncated tag at EOF — drop it (fail-open)
        if closing:
            i = end + 1
            yield ("close", tag, _NO_ATTRS)
            continue
        inner = src[m.end() : end]
        selfclose = inner.rstrip().endswith("/")
        attrs = _NO_ATTRS
        # only class/id feed the boilerplate heuristic — skip attr parsing
        # unless they can be present (hot-path: most tags have neither)
        if inner and ("class" in inner or "id" in inner):
            attrs = {}
            for am in _ATTR_RE.finditer(inner.rstrip("/").strip()):
                name = am.group(1).lower()
                val = am.group(2) or ""
                if val[:1] in "\"'":
                    val = val[1:-1]
                attrs[name] = val
        i = end + 1
        if tag in RAW_TEXT_TAGS and not selfclose:
            close_re = _RAW_CLOSE_RES.get(tag)
            if close_re is None:
                close_re = re.compile(
                    rf"<\s*/\s*{re.escape(tag)}\s*>", re.IGNORECASE
                )
                _RAW_CLOSE_RES[tag] = close_re
            cm = close_re.search(src, i)
            i = n if cm is None else cm.end()
            continue
        if selfclose or tag in VOID_TAGS:
            yield ("selfclose", tag, attrs)
        else:
            yield ("open", tag, attrs)


def _is_boilerplate_attr(attrs: dict[str, str]) -> bool:
    blob = (attrs.get("class", "") + " " + attrs.get("id", "")).lower()
    return _BOILER_KEYWORD_RE.search(blob) is not None


class _Block:
    __slots__ = ("words", "link_words", "boiler")

    def __init__(self, boiler: bool) -> None:
        self.words: list[str] = []
        self.link_words = 0
        self.boiler = boiler


def extract_html(src: str) -> dict[str, object]:
    """Strip boilerplate and return main-content lines.

    Returns ``{"text": str, "blocks": int}`` — one output line per kept
    content block, document order, whitespace collapsed, entities decoded.
    """
    # stack frames: (tag, is_boiler, is_head, is_anchor)
    stack: list[tuple[str, bool, bool, bool]] = []
    open_counts: dict[str, int] = {}
    boiler_depth = 0
    head_depth = 0
    anchor_depth = 0

    blocks: list[_Block] = []
    cur = _Block(False)

    def flush() -> None:
        nonlocal cur
        if cur.words:
            blocks.append(cur)
        cur = _Block(boiler_depth > 0 or head_depth > 0)

    def pop_frame() -> str:
        nonlocal boiler_depth, head_depth, anchor_depth
        tag, is_boiler, is_head, is_anchor = stack.pop()
        open_counts[tag] -= 1
        if is_boiler:
            boiler_depth -= 1
        if is_head:
            head_depth -= 1
        if is_anchor:
            anchor_depth -= 1
        if tag in BLOCK_TAGS or is_boiler:
            flush()
        return tag

    for kind, payload, attrs in _tokenize(src):
        if kind == "text":
            if head_depth > 0:
                continue
            # str.split() collapses+splits in one C call; unescape only
            # when an entity can be present
            text = _htmllib.unescape(payload) if "&" in payload else payload
            words = text.split()
            if not words:
                continue
            if boiler_depth > 0:
                cur.boiler = True
            cur.words.extend(words)
            if anchor_depth > 0:
                cur.link_words += len(words)
            continue

        tag = payload
        if kind in ("open", "selfclose"):
            is_boiler = tag in BOILERPLATE_TAGS or bool(
                attrs and _is_boilerplate_attr(attrs)
            )
            if tag in BLOCK_TAGS or is_boiler:
                flush()
            if kind == "selfclose":
                continue
            is_head = tag in HEAD_TAGS
            is_anchor = tag == "a"
            stack.append((tag, is_boiler, is_head, is_anchor))
            open_counts[tag] = open_counts.get(tag, 0) + 1
            boiler_depth += is_boiler
            head_depth += is_head
            anchor_depth += is_anchor
            continue

        # close tag: pop to the matching open (implicit closes fail-open);
        # a close with no matching open is ignored. open_counts gives O(1)
        # membership instead of scanning the stack per close tag.
        if open_counts.get(tag, 0) > 0:
            while stack and pop_frame() != tag:
                pass

    flush()
    while stack:  # EOF: close everything still open
        pop_frame()
    flush()

    kept: list[str] = []
    for b in blocks:
        if b.boiler or not b.words:
            continue
        if b.link_words / len(b.words) > MAX_LINK_DENSITY:
            continue
        kept.append(" ".join(b.words))

    return {"text": join_lines(kept), "blocks": len(kept)}
