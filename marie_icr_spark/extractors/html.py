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
_RAW_CLOSE_RES: dict[str, re.Pattern] = {}

# One combined scan pattern: a comment opener, a doctype/PI opener, or a
# complete tag (open or close). The tag-body alternation replicates the
# former _tag_end quote state machine exactly: it stops at the first '>'
# outside quotes, or before an unpaired quote / at EOF, in which case
# group 6 ('>?') matches empty = truncated tag. '>?' never fails, so the
# scan is linear (no backtracking).
_SCAN_RE = re.compile(
    r"<(?:(!--)|([!?])|\s*(/?)\s*([a-zA-Z][a-zA-Z0-9-]*)"
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(>?))"
)

# One dict lookup replaces six frozenset membership tests per tag.
F_BLOCK, F_VOID, F_RAW, F_HEAD, F_BOILER, F_ANCHOR = 1, 2, 4, 8, 16, 32
_TAG_FLAGS: dict[str, int] = {}
for _t in BLOCK_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | F_BLOCK
for _t in VOID_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | F_VOID
for _t in RAW_TEXT_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | F_RAW
for _t in HEAD_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | F_HEAD
for _t in BOILERPLATE_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | F_BOILER
_TAG_FLAGS["a"] = _TAG_FLAGS.get("a", 0) | F_ANCHOR
del _t


_SNIFF_TAG_RE = re.compile(r"<\s*/?\s*[a-zA-Z][a-zA-Z0-9-]*(\s|>|/)")


def looks_like_html(text: str) -> bool:
    """Cheap payload sniff: does this contain a real-looking tag?"""
    return _SNIFF_TAG_RE.search(text) is not None


def _is_boilerplate_attr(attrs: dict[str, str]) -> bool:
    blob = (attrs.get("class", "") + " " + attrs.get("id", "")).lower()
    return _BOILER_KEYWORD_RE.search(blob) is not None


def extract_html(src: str) -> dict[str, object]:
    """Strip boilerplate and return main-content lines.

    Returns ``{"text": str, "blocks": int}`` — one output line per kept
    content block, document order, whitespace collapsed, entities decoded.

    Single-pass scanner + block builder in one loop — this is the hottest
    Python in the engine, so the scan is one combined regex (``_SCAN_RE``)
    that classifies comment/declaration/tag AND finds the quoted-attr-safe
    tag end in a single C-level search per tag, and per-tag classification
    is one ``_TAG_FLAGS`` lookup (measured ~1.3x over the per-char
    ``find``/``match``/``_tag_end`` loop on the bench corpus, byte-identical
    on 600k real payloads + 80k adversarial fuzz cases):
    comments/doctypes/PIs are dropped, raw-text elements swallow everything
    up to their close tag, a ``<`` that doesn't start a plausible tag is
    literal text, truncated tags at EOF are dropped (fail-open).
    """
    # open-tag stack frames: (tag, is_boiler, flags)
    stack: list[tuple[str, bool, int]] = []
    open_counts: dict[str, int] = {}
    boiler_depth = 0
    head_depth = 0
    anchor_depth = 0

    # current block accumulator (a fresh list only when words were flushed;
    # link-word count is always 0 when the word list is empty)
    blocks: list[tuple[list[str], int, bool]] = []
    cur_words: list[str] = []
    cur_link = 0
    cur_boiler = False

    i, n = 0, len(src)
    search = _SCAN_RE.search
    find = src.find
    tag_flags = _TAG_FLAGS.get
    counts_get = open_counts.get
    while i < n:
        m = search(src, i)
        if m is not None:
            s, e = m.span()
        else:
            s = n
        if s > i and head_depth == 0:
            gap = src[i:s]
            if "<" not in gap:
                # str.split() collapses+splits in one C call; unescape
                # only when an entity can be present
                if "&" in gap:
                    gap = _htmllib.unescape(gap)
                words = gap.split()
                if words:
                    if boiler_depth > 0:
                        cur_boiler = True
                    cur_words.extend(words)
                    if anchor_depth > 0:
                        cur_link += len(words)
            else:
                # every '<' inside a gap failed all _SCAN_RE alternatives,
                # i.e. it is literal text: its own word, splitting the text
                # run (unescape applies per run, not across the '<').
                parts = gap.split("<")
                # Pinned quirk: a '<' that is the very last character of
                # the document is skipped as a declaration (its lookahead
                # character is "" and ``"" in "!?"`` is True) — dropped,
                # not a literal word.
                last_k = len(parts) - 1
                drop_last = m is None and parts[last_k] == ""
                for k, chunk in enumerate(parts):
                    if k and not (drop_last and k == last_k):
                        if boiler_depth > 0:
                            cur_boiler = True
                        cur_words.append("<")
                        if anchor_depth > 0:
                            cur_link += 1
                    if "&" in chunk:
                        chunk = _htmllib.unescape(chunk)
                    words = chunk.split()
                    if words:
                        if boiler_depth > 0:
                            cur_boiler = True
                        cur_words.extend(words)
                        if anchor_depth > 0:
                            cur_link += len(words)
        if m is None:
            break
        bang, decl, slash, name, inner, gt = m.groups()
        if name is None:  # comments / doctype / processing instructions
            if bang:
                end = find("-->", s + 4)
                i = n if end == -1 else end + 3
            else:
                end = find(">", s)
                i = n if end == -1 else end + 1
            continue
        if not gt:
            break  # truncated tag at EOF — drop it (fail-open)
        tag = name.lower()
        i = e
        flags = tag_flags(tag, 0)
        if slash:  # close tag: pop to the matching open (fail-open);
            # a close with no matching open is ignored. open_counts gives
            # O(1) membership instead of scanning the stack per close.
            if counts_get(tag, 0) > 0:
                while stack:
                    t2, b2, f2 = stack.pop()
                    open_counts[t2] -= 1
                    if b2:
                        boiler_depth -= 1
                    if f2 & F_HEAD:
                        head_depth -= 1
                    if f2 & F_ANCHOR:
                        anchor_depth -= 1
                    if b2 or f2 & F_BLOCK:
                        if cur_words:
                            blocks.append((cur_words, cur_link, cur_boiler))
                            cur_words = []
                            cur_link = 0
                        cur_boiler = boiler_depth > 0 or head_depth > 0
                    if t2 == tag:
                        break
            continue
        # only class/id feed the boilerplate heuristic — skip attr parsing
        # unless they can be present (hot-path: most tags have neither).
        # The gate must be case-insensitive (CLASS= is legal HTML and
        # _ATTR_RE lowercases names anyway); the lowercase substring test
        # runs first so the common case never pays the .lower() allocation
        if inner:
            c = inner[-1]
            selfclose = c == "/" or (
                c.isspace() and inner.rstrip().endswith("/")
            )
            if (
                "class" in inner
                or "id" in inner
                or "class" in (il := inner.lower())
                or "id" in il
            ):
                attrs: dict[str, str] = {}
                for am in _ATTR_RE.finditer(inner.rstrip("/").strip()):
                    aname = am.group(1).lower()
                    val = am.group(2) or ""
                    if val[:1] in "\"'":
                        val = val[1:-1]
                    attrs[aname] = val
                is_boiler = bool(flags & F_BOILER) or (
                    bool(attrs) and _is_boilerplate_attr(attrs)
                )
            else:
                is_boiler = bool(flags & F_BOILER)
        else:
            selfclose = False
            is_boiler = bool(flags & F_BOILER)
        if flags & F_RAW and not selfclose:
            close_re = _RAW_CLOSE_RES.get(tag)
            if close_re is None:
                close_re = re.compile(
                    rf"<\s*/\s*{re.escape(tag)}\s*>", re.IGNORECASE
                )
                _RAW_CLOSE_RES[tag] = close_re
            cm = close_re.search(src, i)
            i = n if cm is None else cm.end()
            continue
        if is_boiler or flags & F_BLOCK:
            if cur_words:
                blocks.append((cur_words, cur_link, cur_boiler))
                cur_words = []
                cur_link = 0
            cur_boiler = boiler_depth > 0 or head_depth > 0
        if selfclose or flags & F_VOID:
            continue
        stack.append((tag, is_boiler, flags))
        open_counts[tag] = counts_get(tag, 0) + 1
        if is_boiler:
            boiler_depth += 1
        if flags & F_HEAD:
            head_depth += 1
        if flags & F_ANCHOR:
            anchor_depth += 1

    if cur_words:  # flush the trailing block
        blocks.append((cur_words, cur_link, cur_boiler))
        cur_words = []
        cur_link = 0
    cur_boiler = boiler_depth > 0 or head_depth > 0
    while stack:  # EOF: close everything still open
        t2, b2, f2 = stack.pop()
        open_counts[t2] -= 1
        if b2:
            boiler_depth -= 1
        if f2 & F_HEAD:
            head_depth -= 1
        if f2 & F_ANCHOR:
            anchor_depth -= 1
        if b2 or f2 & F_BLOCK:
            if cur_words:
                blocks.append((cur_words, cur_link, cur_boiler))
                cur_words = []
                cur_link = 0
            cur_boiler = boiler_depth > 0 or head_depth > 0
    if cur_words:
        blocks.append((cur_words, cur_link, cur_boiler))

    kept: list[str] = []
    for words, link_words, boiler in blocks:
        if boiler or not words:
            continue
        if link_words / len(words) > MAX_LINK_DENSITY:
            continue
        kept.append(" ".join(words))

    return {"text": join_lines(kept), "blocks": len(kept)}
