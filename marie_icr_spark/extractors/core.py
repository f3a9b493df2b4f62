"""Per-turn extraction dispatcher — the Spark-free twin of the engine.

Sniffs the payload kind of a turn's ``text`` and routes to the matching
extractor, mirroring the reference's engine-selection contract
(``marie/ocr/util.py:89-151``; PSM dispatch ``marie/boxes/box_processor.py:129-162``):

  layout   JSON word boxes (tool turns like pdf_reader)  → extractors.layout
  html     embedded HTML fragments                       → extractors.html
  markdown fenced/tool-call-noise markdown               → extractors.markdown
  plain    anything else (fail-open identity+normalize)  → extractors.textnorm
  empty    blank/whitespace payloads → empty result, never an error
           (blank-page contract, marie/document/ocr_processor.py:146-154)

This module is used both (a) inside the Spark pandas UDFs and (b) as the
single-process reference extractor that produces golden outputs for the
correctness gate (pattern of marie/ocr/mock_ocr_engine.py:35-53).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .html import extract_html, looks_like_html
from .layout import (
    extract_layout,
    extract_layout_text,
    extract_layout_tuples,
    parse_layout_payload,
)
from .markdown import extract_markdown, looks_like_markdown
from .textnorm import normalize_plain, span_count

PAYLOAD_KINDS = ("layout", "html", "markdown", "plain", "empty")


@dataclass
class TurnExtraction:
    extracted_text: str
    span_count: int
    payload_kind: str
    words: list[dict[str, Any]] = field(default_factory=list)
    lines: list[dict[str, Any]] = field(default_factory=list)


def _sniff(text: str) -> tuple[str, tuple[list, list] | None]:
    """Classify a turn payload; returns (kind, parsed (texts, boxes)|None).
    Order matters and is pinned: empty → layout(JSON) → html → markdown →
    plain."""
    # lstrip() is empty iff strip() is empty, so one scan decides both the
    # blank-payload case and the JSON first-char probe
    s = text.lstrip() if text is not None else ""
    if not s:
        return "empty", None
    if s[0] in "[{":
        parsed = parse_layout_payload(text)
        if parsed is not None:
            return "layout", parsed
    if looks_like_html(text):
        return "html", None
    if looks_like_markdown(text):
        return "markdown", None
    return "plain", None


def sniff_payload_kind(text: str) -> str:
    return _sniff(text)[0]


def extract_turn(
    text: str | None, mode: str = "sparse", with_structs: bool = True
) -> TurnExtraction:
    """Extract the main content of one turn payload. Never raises on
    malformed input (fail-open contract, marie/pipe/extract_pipeline.py:143-154).
    ``mode`` is the PSM contract for layout payloads (PSM_MODES);
    ``with_structs=False`` takes the struct-free layout path (identical
    text, no word/line structs built)."""
    kind, parsed = _sniff(text or "")
    if kind == "empty":
        return TurnExtraction("", 0, "empty")
    assert text is not None
    if kind == "layout":
        texts, boxes = parsed if parsed is not None else ([], [])
        if not with_structs:
            out = extract_layout_text(texts, boxes, mode=mode)
            return TurnExtraction(out, span_count(out), "layout")
        res = extract_layout(texts, boxes, mode=mode)
        return TurnExtraction(
            res["text"], span_count(res["text"]), "layout",
            words=res["words"], lines=res["lines"],
        )
    if kind == "html":
        res = extract_html(text)
        return TurnExtraction(res["text"], span_count(res["text"]), "html")
    if kind == "markdown":
        res = extract_markdown(text)
        return TurnExtraction(res["text"], span_count(res["text"]), "markdown")
    out = normalize_plain(text)
    return TurnExtraction(out, span_count(out), "plain")


def extract_turn_arrow(
    text: str | None, mode: str = "sparse"
) -> tuple[str, str, int, list[tuple], list[tuple]]:
    """``extract_turn(..., with_structs=True)`` for the Spark Arrow boundary:
    returns ``(payload_kind, extracted_text, span_count, word_tuples,
    line_tuples)`` with the structs already as field-ordered tuples
    (``extractors.layout.extract_layout_tuples``), skipping the dict build +
    dict→tuple reconversion of the golden path. Value-identical to
    ``extract_turn`` (certified by test + corpus diff); the golden dict form
    stays the single-process reference."""
    kind, parsed = _sniff(text or "")
    if kind == "empty":
        return "empty", "", 0, [], []
    assert text is not None
    if kind == "layout":
        texts, boxes = parsed if parsed is not None else ([], [])
        out, words, lines = extract_layout_tuples(texts, boxes, mode=mode)
        return "layout", out, span_count(out), words, lines
    if kind == "html":
        out = extract_html(text)["text"]
        return "html", out, span_count(out), [], []
    if kind == "markdown":
        out = extract_markdown(text)["text"]
        return "markdown", out, span_count(out), [], []
    out = normalize_plain(text)
    return "plain", out, span_count(out), [], []
