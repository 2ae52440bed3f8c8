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

import numpy as np
import pandas as pd

# ASCII fast path: token = alnum, then (alnum | ')*  — StandardTokenizer.h:118-137
_ASCII_TOKEN = re.compile(r"[A-Za-z0-9][A-Za-z0-9']*")
_IS_ASCII = re.compile(r"^[\x00-\x7f]*$")

# Unicode fallback (ICU stand-in): letters/digits runs incl. apostrophe.
# Underscore is a separator (as in the ASCII path) — [^\W_] excludes it
# from both the start and continuation classes so 'foo_bar' tokenizes the
# same whether or not the row contains non-ASCII characters elsewhere.
_UNI_TOKEN = re.compile(r"[^\W_](?:[^\W_]|')*", re.UNICODE)

# Real ICU UAX#29 segmentation when PyICU is installed (the reference's
# exact path, StandardTokenizer.h:195-260) — the regex above remains the
# documented fallback. Gated import: the sandbox image has no PyICU; a
# cluster image with it picks this up with zero config.
try:  # pragma: no cover - exercised only where PyICU is installed
    import icu as _icu
    HAVE_ICU = True
except ImportError:
    _icu = None
    HAVE_ICU = False


def _icu_tokenize(text: str) -> list[str]:  # pragma: no cover - needs PyICU
    """UAX#29 word segmentation via ICU BreakIterator: keep segments with
    a word/number/ideographic rule status (this is what carries numerics
    with `.,-` through as single tokens), lowercase."""
    bi = _icu.BreakIterator.createWordInstance(_icu.Locale.getRoot())
    bi.setText(text)
    toks: list[str] = []
    start = bi.first()
    for end in bi:
        if bi.getRuleStatus() >= 100:  # >= UBRK_WORD_NUMBER: real words
            toks.append(text[start:end].lower())
        start = end
    return toks


def tokenize(text: str) -> list[str]:
    """Tokenize one string (pure-Python; tests + oracle use this)."""
    if text is None:
        return []
    if _IS_ASCII.match(text):
        return [t.lower() for t in _ASCII_TOKEN.findall(text)]
    if HAVE_ICU:
        return _icu_tokenize(text)
    toks = []
    for t in _UNI_TOKEN.findall(text):
        t = t.lower()
        # drop pure-punctuation artifacts; keep tokens with letter/digit
        if any(c.isalnum() for c in t):
            toks.append(t)
    return toks


# translate table: A-Z -> a-z; keep a-z 0-9 '; everything else -> space.
# bytes.translate + split is ~4x faster than regex findall and produces
# the identical token stream (leading apostrophes stripped post-split,
# because a token must START alphanumeric — StandardTokenizer.h:118-124).
_TRANS = bytes(
    (c + 32) if 65 <= c <= 90 else
    (c if (97 <= c <= 122 or 48 <= c <= 57 or c == 39) else 32)
    for c in range(256))


def _ascii_tokens_bytes(s: str) -> list[bytes]:
    tb = s.encode("ascii").translate(_TRANS)
    toks = tb.split()
    if b"'" not in tb:  # common case: no apostrophes at all
        return toks
    out = []
    for t in toks:
        t = t.lstrip(b"'")
        if t:
            out.append(t)
    return out


def tokenize_series_bytes(texts: pd.Series) -> pd.Series:
    """Fast-path tokenizer: Series[str] -> Series[list[bytes]] (utf-8).

    Token-for-token identical to tokenize_series, with tokens as bytes —
    lets downstream factorize/group without building python str objects
    (decode only the per-group vocabulary). Non-ASCII rows route through
    the standard path and utf-8-encode.
    """
    texts = texts.fillna("")
    is_ascii = texts.str.match(_IS_ASCII)
    out = pd.Series([None] * len(texts), index=texts.index, dtype=object)
    if is_ascii.any():
        out[is_ascii] = texts[is_ascii].map(_ascii_tokens_bytes)
    if (~is_ascii).any():
        out[~is_ascii] = texts[~is_ascii].map(
            lambda t: [x.encode("utf-8") for x in tokenize(t)])
    return out


def count_tokens_series(texts: pd.Series) -> np.ndarray:
    """Token counts per row (doc_len for norms) via the fast path."""
    return np.fromiter((len(t) for t in tokenize_series_bytes(texts)),
                       dtype=np.int64, count=len(texts))


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
