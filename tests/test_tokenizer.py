"""Tokenizer behavior vs the reference ASCII fast path
(util/StandardTokenizer.h:100-150)."""

import pandas as pd

from diagon_spark.analysis.tokenizer import tokenize, tokenize_series


def test_ascii_basic():
    assert tokenize("int main() { return 0; }") == ["int", "main", "return", "0"]


def test_lowercase():
    assert tokenize("Foo BAR baz") == ["foo", "bar", "baz"]


def test_apostrophe_inside_token():
    # token continues over apostrophes but cannot start with one
    assert tokenize("don't 'quoted'") == ["don't", "quoted'"]


def test_numbers_kept():
    assert tokenize("x = 42 + 0xFF") == ["x", "42", "0xff"]


def test_punctuation_dropped():
    assert tokenize("... ---- ;;; ") == []


def test_empty_and_none():
    assert tokenize("") == []
    assert tokenize(None) == []


def test_non_ascii_fallback():
    toks = tokenize("café_x naïve λcalc")
    assert "café" in toks or "café_x" in toks  # unicode word run
    assert all(t == t.lower() for t in toks)


def test_series_matches_scalar():
    texts = ["int main() {}", "Foo don't 42", "", "café_7 test", None]
    got = tokenize_series(pd.Series(texts)).tolist()
    want = [tokenize(t) for t in texts]
    assert got == want
