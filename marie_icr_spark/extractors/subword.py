"""Subword (WordPiece) tokenization + sliding-window golden contract.

Pure Python, no Spark imports — this module IS the oracle twin: the DuckDB
SQL oracle replays exactly these rules (greedy longest-match from the same
vocab file via a recursive CTE), and the Spark operator
(``operators/tokenizer.py``) calls these functions Arrow-batched.

Reference parity: the reference tokenizes documents with a pretrained
subword tokenizer and slides fixed windows over long token sequences —
``max_length=512, stride=128`` with overflowing tokens — before feeding the
model (``marie/executor/ner/ner_extraction_executor.py:192-374``; subword→
word realignment at :258-300, the F5 filter). The tokenizer here is
file-driven like the reference's (vocab.txt, id = line number), with the
model head replaced by the integer linear classifier (no torch in this
container).

Pinned contract (both engines):

* words = whitespace tokens of the trimmed, whitespace-collapsed text
  (identical to ``functions.columns.ws_tokens`` and its SQL twin);
* per word, greedy longest-match over the vocab: at position 0 match
  word-initial pieces, at positions > 0 match ``##``-continuations
  (longest wins; equal lengths cannot tie — pieces are unique per form);
  if nothing matches, emit ``[UNK]`` and advance ONE char (per-char
  fail-soft — byte-fallback-style, so one bad char doesn't erase the
  word; documented divergence from classic whole-word-[UNK] WordPiece);
* windows: content capacity C = max_length − 2 (reserving [CLS]/[SEP]),
  consecutive windows OVERLAP by ``stride`` tokens (HF semantics), i.e.
  window k starts at k·(C − stride); n_windows = 1 if n ≤ C else
  ⌈(n − C)/(C − stride)⌉ + 1; the last window may be short; a doc with
  zero content tokens emits no windows;
* ``window_fingerprint`` = order-sensitive rolling hash over the window's
  CONTENT piece ids: acc ← (acc·257 + id + 1) mod (2³¹−1) — certifies the
  exact token id sequence without materializing it in query results.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

HASH_P = 2_147_483_647  # 2^31 - 1, same modulus as functions.columns
FP_MULT = 257

PAD_ID, UNK_ID, CLS_ID, SEP_ID = 0, 1, 2, 3

MAX_LENGTH = 512  # reference contract (ner_extraction_executor.py:192-374)
STRIDE = 128

# the pinned whitespace contract (same as dedup._py_shingle_list): strip
# SPACES only (Spark trim / DuckDB trim default), collapse JAVA ASCII \s
# runs [ \t\n\x0b\f\r] — NOT Python's unicode-aware str.split() (splits
# on \xa0 etc.) and NOT RE2's \s (no \x0b): the oracle SQL spells the
# class out explicitly for exactly this reason
_ASCII_WS = re.compile("[ \t\n\x0b\f\r]+")


def load_vocab(path: str) -> dict[str, int]:
    """vocab.txt → {piece: id} (id = line number, standard layout)."""
    with open(path) as f:
        pieces = [ln.rstrip("\n") for ln in f]
    if pieces and pieces[-1] == "":
        pieces.pop()
    vocab = {p: i for i, p in enumerate(pieces)}
    if len(vocab) != len(pieces):
        raise ValueError("duplicate pieces in vocab file")
    for sp, want in (("[PAD]", PAD_ID), ("[UNK]", UNK_ID), ("[CLS]", CLS_ID),
                     ("[SEP]", SEP_ID)):
        if vocab.get(sp) != want:
            raise ValueError(f"vocab must pin {sp} at id {want}")
    return vocab


@dataclass(frozen=True)
class WordPieceTokenizer:
    """Greedy longest-match tokenizer over a loaded vocab."""

    initial: dict[str, int]  # word-initial pieces (no ## prefix)
    cont: dict[str, int]     # continuation pieces, keyed WITHOUT the ##
    max_piece_len: int

    @classmethod
    def from_vocab(cls, vocab: dict[str, int]) -> "WordPieceTokenizer":
        initial, cont = {}, {}
        for p, i in vocab.items():
            if p.startswith("[") and p.endswith("]"):
                continue
            if p.startswith("##"):
                cont[p[2:]] = i
            else:
                initial[p] = i
        max_len = max(
            (len(k) for k in (*initial, *cont)), default=1
        )
        return cls(initial=initial, cont=cont, max_piece_len=max_len)

    def encode_word(self, word: str) -> list[int]:
        """Piece ids for one word (empty word → no pieces)."""
        ids: list[int] = []
        pos, n = 0, len(word)
        while pos < n:
            table = self.initial if pos == 0 else self.cont
            hit = None
            for ln in range(min(self.max_piece_len, n - pos), 0, -1):
                hit = table.get(word[pos:pos + ln])
                if hit is not None:
                    pos += ln
                    break
            if hit is None:
                hit = UNK_ID
                pos += 1
            ids.append(hit)
        return ids

    def encode_text(self, text: str) -> tuple[list[int], list[int]]:
        """(piece_ids, word_ids): word_ids[i] = 0-based ordinal of the
        whitespace word that produced piece i (the subword→word alignment
        the F5 first-subword filter consumes)."""
        ids: list[int] = []
        word_ids: list[int] = []
        words = _ASCII_WS.sub(" ", (text or "").strip(" ")).split(" ")
        for wi, w in enumerate(words):
            for pid in self.encode_word(w):
                ids.append(pid)
                word_ids.append(wi)
        return ids, word_ids


def window_spans(n: int, max_length: int = MAX_LENGTH,
                 stride: int = STRIDE) -> list[tuple[int, int]]:
    """[(start, end)) content-token spans of each sliding window.

    C = max_length - 2; consecutive windows overlap by ``stride`` tokens.
    n == 0 → no windows.
    """
    c = max_length - 2
    if c <= 0:
        raise ValueError("max_length must exceed 2 (CLS/SEP overhead)")
    if not 0 <= stride < c:
        raise ValueError("stride must satisfy 0 <= stride < max_length - 2")
    if n <= 0:
        return []
    if n <= c:
        return [(0, n)]
    step = c - stride
    n_windows = -((n - c) // -step) + 1  # ceil div
    return [(k * step, min(k * step + c, n)) for k in range(n_windows)]


def window_fingerprint(ids: list[int]) -> int:
    """Order-sensitive rolling hash over content piece ids (SQL twin:
    list_reduce((a,b) -> (a*257 + b + 1) % P))."""
    acc = 0
    for i in ids:
        acc = (acc * FP_MULT + i + 1) % HASH_P
    return acc


def default_vocab_path() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "wordpiece_vocab.txt",
    )
