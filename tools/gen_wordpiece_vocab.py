#!/usr/bin/env python
"""Generate the checked-in WordPiece vocab fixture (run once; the engine
only ever LOADS the output file, mirroring how the reference loads its
pretrained tokenizer vocab from disk rather than deriving it from data).

Layout (standard vocab.txt: one piece per line, id = line number):
  0-3    specials [PAD] [UNK] [CLS] [SEP]
  4..    single ASCII letters/digits as word-initial pieces (full coverage:
         any alnum word tokenizes without [UNK], like WordPiece's char set)
  ..     the same as ##-continuations
  ..     common English digram/trigram/affix subwords, word-initial and
         continuation (these make greedy longest-match produce real
         multi-char pieces instead of degenerating to per-char splits)
"""

import string

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
CHARS = list(string.ascii_lowercase) + list(string.digits)
SUBWORDS = [
    # common digrams/trigrams (frequency-ordered public lists)
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur",
    "the", "ing", "and", "ion", "ent", "for", "tio", "ere", "her",
    "ate", "ver", "ter", "tha", "ati", "hat", "ers",
    # common affixes
    "un", "pre", "pro", "con", "com", "dis", "sub", "per",
    "ment", "able", "tion", "ness", "less", "ful",
]


def main() -> None:
    pieces = list(SPECIALS)
    pieces += CHARS
    pieces += ["##" + c for c in CHARS]
    for s in SUBWORDS:
        pieces.append(s)
        pieces.append("##" + s)
    assert len(pieces) == len(set(pieces)), "duplicate piece"
    out = "marie_icr_spark/fixtures/wordpiece_vocab.txt"
    with open(out, "w") as f:
        f.write("\n".join(pieces) + "\n")
    print(f"{out}: {len(pieces)} pieces")


if __name__ == "__main__":
    main()
