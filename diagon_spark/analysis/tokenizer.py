"""Standard tokenizer — behavior-identical to the reference's indexing path.

Reference semantics (util/StandardTokenizer.h:39-260, document/Field.h:76-113):

* ASCII fast path (StandardTokenizer.h:100-150): a token starts at an
  ASCII alphanumeric `[A-Za-z0-9]` and continues over alphanumerics *or*
  apostrophe `'`; everything is lowercased byte-wise. A token can never
  start with `'`, but may contain or end with one ("don't", "rock'").
* Non-ASCII strings go through ICU UAX#29 word segmentation + lowercase +
  drop whitespace/punctuation-only tokens, keep numerics with `.,-`
  (StandardTokenizer.h:195-260). PyICU is not available in this
  environment, so the fallback approximates UAX#29 with a Unicode-aware
  regex over `\\w` runs — documented divergence, exercised only by the
  ~1% non-ASCII fixture rows; all correctness fixtures and the reference
  query set are pure ASCII where the two paths agree exactly.

The hot path is vectorized: one pandas Series in, one Series of
list[str] out (Arrow batches; no per-row Python in the Spark plan).
"""

from __future__ import annotations

import re

import pandas as pd

# ASCII fast path: token = alnum, then (alnum | ')*  — StandardTokenizer.h:118-137
_ASCII_TOKEN = re.compile(r"[A-Za-z0-9][A-Za-z0-9']*")
_IS_ASCII = re.compile(r"^[\x00-\x7f]*$")

# Unicode fallback (ICU stand-in): letters/digits runs incl. apostrophe
_UNI_TOKEN = re.compile(r"[^\W_]['\w]*", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Tokenize one string (pure-Python; tests + oracle use this)."""
    if text is None:
        return []
    if _IS_ASCII.match(text):
        return [t.lower() for t in _ASCII_TOKEN.findall(text)]
    toks = []
    for t in _UNI_TOKEN.findall(text):
        t = t.lower()
        # drop pure-punctuation artifacts; keep tokens with letter/digit
        if any(c.isalnum() for c in t):
            toks.append(t)
    return toks


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer for pandas-UDF use: Series[str] -> Series[list[str]].

    ASCII rows take the regex fast path via pandas .str accessor
    (C-level); rare non-ASCII rows fall back per-row.
    """
    texts = texts.fillna("")
    is_ascii = texts.str.match(_IS_ASCII)
    out = pd.Series([None] * len(texts), index=texts.index, dtype=object)
    if is_ascii.any():
        asc = texts[is_ascii].str.lower().str.findall(_ASCII_TOKEN)
        out[is_ascii] = asc
    if (~is_ascii).any():
        out[~is_ascii] = texts[~is_ascii].map(tokenize)
    return out
