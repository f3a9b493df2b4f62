"""Markdown/tool-noise extraction: strip scaffolding, keep prose.

Analogue of the reference's payload pruning — recursive deletion of
``fragment_b64``/``overlay_b64`` blobs from result trees
(``marie/ocr/ocr_engine.py:392-412``) — applied to transcript turns: fenced
code blocks, tool-call JSON blobs and base64 noise are scaffolding, prose is
content.

Contract (pinned for golden stability):
* fenced blocks (``` or ~~~) are dropped, fence markers included
* lines that are a single long base64 run (>= 40 chars) are dropped
* standalone JSON tool-call lines ({...} containing a "tool"/"tool_call"/
  "function" key) are dropped
* heading markers (#...), blockquote markers (>) and list bullets (-, *, +,
  digits.) are stripped; the text is kept
* a paragraph (blank-line-delimited run of kept lines) becomes ONE output
  line, whitespace collapsed; paragraphs joined with "\n"
"""

from __future__ import annotations

import re

from .textnorm import collapse_ws, join_lines

_FENCE_RE = re.compile(r"^\s*(```|~~~)")
_BASE64_LINE_RE = re.compile(r"^\s*[A-Za-z0-9+/]{40,}={0,2}\s*$")
_HEADING_RE = re.compile(r"^\s{0,3}#{1,6}\s+")
_QUOTE_RE = re.compile(r"^\s{0,3}>\s?")
_BULLET_RE = re.compile(r"^\s{0,3}(?:[-*+]|\d{1,3}[.)])\s+")
_TOOLCALL_KEY_RE = re.compile(r'"(?:tool|tool_call|tool_calls|function|function_call)"\s*:')

# Multiline twin of the four per-line sniff regexes in ONE search. Boolean-
# equivalent to matching each split line separately: the trailing
# whitespace requirements use [^\S\n] (whitespace-but-not-newline) so a
# marker can never borrow its required whitespace from the next line, and
# a leading \s crossing a newline implies the marker sits at column 0 of
# its own line, where that line's own ^ anchor matches it anyway.
_MD_SNIFF_RE = re.compile(
    r"^\s*(?:```|~~~)"
    r"|^\s{0,3}(?:#{1,6}[^\S\n]|>|(?:[-*+]|\d{1,3}[.)])[^\S\n])",
    re.M,
)
# Characters that can begin a heading/quote/bullet marker — lines whose
# first non-space character is anything else skip the three strip regexes.
_MARKER_CHARS = frozenset("#>-*+0123456789")


def looks_like_markdown(text: str) -> bool:
    """Sniff: fences, headings, blockquotes or bullets on any line."""
    return _MD_SNIFF_RE.search(text) is not None


def _is_toolcall_line(line: str) -> bool:
    s = line.strip()
    return s.startswith("{") and s.endswith("}") and bool(_TOOLCALL_KEY_RE.search(s))


def extract_markdown(src: str) -> dict[str, object]:
    """Return ``{"text": str, "blocks": int}`` — one line per kept paragraph."""
    paragraphs: list[str] = []
    cur: list[str] = []
    in_fence = False
    fence_marker = ""

    def close_paragraph() -> None:
        if cur:
            paragraphs.append(" ".join(cur))
            cur.clear()

    # First-char dispatch: each guard below is exactly the precondition of
    # the regex it gates (a fence needs '`'/'~', a tool-call line needs '{',
    # a marker strip needs '#'/'>'/bullet/digit as the first non-space
    # char), so the common prose line pays one lstrip + one split only.
    for raw in src.split("\n"):
        sl = raw.lstrip()
        c = sl[:1]
        if (c == "`" or c == "~") and _FENCE_RE.match(raw):
            if in_fence and sl.startswith(fence_marker):
                in_fence = False
            elif not in_fence:
                in_fence = True
                fence_marker = sl[:3]
            close_paragraph()
            continue
        if in_fence:
            continue
        if not c:
            close_paragraph()
            continue
        if (_BASE64_LINE_RE.match(raw) if c not in "{}" else False) or (
            c == "{" and _is_toolcall_line(raw)
        ):
            close_paragraph()
            continue
        line = raw
        if c in _MARKER_CHARS:
            line = _HEADING_RE.sub("", line)
            line = _QUOTE_RE.sub("", line)
            line = _BULLET_RE.sub("", line)
        line = collapse_ws(line)
        if line:
            cur.append(line)
    close_paragraph()

    return {"text": join_lines(paragraphs), "blocks": len(paragraphs)}
